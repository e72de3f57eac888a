"""Ablation timing of the W48 forward on the real chip: full vs trunk-only
(num_deconvs=0) to locate where the time goes. Cache-proof scan timing."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtpe_tpu.models import PoseHigherHRNet, w48_config
from rtpe_tpu.utils.watchdog import CompileWatchdog

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SCAN = 5

wd = CompileWatchdog(interval=90.0).start()

def bench(model, tag):
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)), train=False))()
    @jax.jit
    def loop(v, x):
        def body(c, _):
            outs = model.apply(v, c, train=False)
            y = outs[-1]
            c = c + (jnp.mean(y.astype(jnp.float32)) * 1e-9).astype(c.dtype)
            return c, jnp.sum(outs[0].astype(jnp.float32))
        _, s = jax.lax.scan(body, x, None, length=SCAN)
        return s
    x = jax.random.normal(jax.random.PRNGKey(1), (BS, 640, 640, 3), jnp.float32)
    t0 = time.time(); jax.device_get(loop(v, x)); print(f"{tag}: compile+1st {time.time()-t0:.1f}s", flush=True)
    wd.alive()
    ts = []
    for t in range(3):
        x2 = jax.random.normal(jax.random.PRNGKey(97 + t), (BS, 640, 640, 3), jnp.float32)
        jax.device_get(x2)
        t0 = time.time(); jax.device_get(loop(v, x2)); ts.append(time.time() - t0)
    dt = min(ts) / SCAN
    c = loop.lower(v, x).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    fl = ca.get("flops", float("nan")) / SCAN
    ba = ca.get("bytes accessed", float("nan")) / SCAN
    print(f"{tag}: {BS*1000/ (dt*1000):.1f} img/s  {dt*1e3:.1f} ms/batch  "
          f"flops/batch={fl/1e9:.1f}G  bytes/batch={ba/1e9:.2f}GB  "
          f"-> {fl/dt/1e12:.1f} TFLOP/s, {ba/dt/1e9:.0f} GB/s", flush=True)
    return dt

full = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.bfloat16)
trunk = PoseHigherHRNet(cfg=dataclasses.replace(
    w48_config(), num_deconvs=0, deconv_cat=(), deconv_chans=(),
    deconv_ksize=(), with_ae_loss=(True,)), dtype=jnp.bfloat16)

dt_full = bench(full, "full ")
dt_trunk = bench(trunk, "trunk")
print(f"head share: {(dt_full-dt_trunk)/dt_full*100:.0f}% of full forward")
wd.stop()
