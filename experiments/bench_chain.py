import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rtpe_tpu.ops.pallas_blocks import basicblock_chain
from rtpe_tpu.utils.watchdog import CompileWatchdog

wd = CompileWatchdog(interval=90.0).start()
rng = np.random.RandomState(0)

def make_ref(n):
    def ref_chain(x, w, b):
        for i in range(n):
            y = jax.lax.conv_general_dilated(x, w[i,0], (1,1), ((1,1),(1,1)),
                dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.float32)
            y = jnp.maximum(y + b[i,0], 0.).astype(x.dtype)
            y = jax.lax.conv_general_dilated(y, w[i,1], (1,1), ((1,1),(1,1)),
                dimension_numbers=("NHWC","HWIO","NHWC"), preferred_element_type=jnp.float32)
            y = (y + b[i,1]).astype(x.dtype)
            x = jnp.maximum(y + x, 0.)
        return x
    return ref_chain

def bench(h, w_, c, n, B=16):
    x = jnp.asarray(rng.randn(B,h,w_,c).astype(np.float32)*.1, jnp.bfloat16)
    W = jnp.asarray(rng.randn(n,2,3,3,c,c).astype(np.float32)*.05, jnp.bfloat16)
    Bb = jnp.asarray(rng.randn(n,2,c).astype(np.float32)*.1)
    ref = make_ref(n)
    # correctness on chip
    got = basicblock_chain(x, W, Bb)
    want = jax.jit(ref)(x, W, Bb)
    err = np.abs(np.asarray(got,np.float32)-np.asarray(want,np.float32)).max()
    # differential scan timing
    def lp(fn, scan):
        @jax.jit
        def loop(x, W, Bb):
            def body(c_, _):
                return fn(c_, W, Bb), ()
            c_, _ = jax.lax.scan(body, x, None, length=scan)
            return jnp.sum(c_.astype(jnp.float32))
        return loop
    out = {}
    for name, fn in (("pallas", lambda x,W,B_: basicblock_chain(x,W,B_)),
                     ("xla   ", ref)):
        l8, l24 = lp(fn, 8), lp(fn, 24)
        jax.device_get(l8(x,W,Bb)); jax.device_get(l24(x,W,Bb))
        wd.alive()
        ts8, ts24 = [], []
        for t in range(3):
            x2 = jnp.asarray(rng.randn(B,h,w_,c).astype(np.float32)*.1, jnp.bfloat16)
            jax.device_get(x2)
            t0=time.time(); jax.device_get(l8(x2,W,Bb)); ts8.append(time.time()-t0)
            t0=time.time(); jax.device_get(l24(x2,W,Bb)); ts24.append(time.time()-t0)
        dt = (min(ts24)-min(ts8))/16
        out[name]=dt
        fl = 2*B*h*w_*9*c*c*2*n
        print(f"({B},{h},{w_},{c}) n={n} {name}: {dt*1e3:7.3f} ms/chain "
              f"{fl/dt/1e12:6.1f} TF/s", flush=True)
    print(f"   speedup {out['xla   ']/out['pallas']:.2f}x  maxerr {err:.1e}", flush=True)

bench(80, 80, 96, 4)
bench(40, 40, 192, 4)
bench(20, 20, 384, 4)
wd.stop()
