"""Microbench: 3x3 conv per-iteration cost via differential scan timing
(removes the ~29ms tunnel dispatch overhead)."""
import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rtpe_tpu.utils.watchdog import CompileWatchdog

wd = CompileWatchdog(interval=90.0).start()

def make_loop(scan):
    def loop(x, k):
        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)
            return jnp.maximum(y, 0) * 0.1, ()
        c, _ = jax.lax.scan(body, x, None, length=scan)
        return jnp.sum(c.astype(jnp.float32))
    return jax.jit(loop)

def timed(loop, b, h, w, c_, k):
    ts = []
    for t in range(3):
        x2 = jax.random.normal(jax.random.PRNGKey(7 + t), (b, h, w, c_),
                               jnp.bfloat16)
        jax.device_get(x2)
        t0 = time.time(); jax.device_get(loop(x2, k))
        ts.append(time.time() - t0)
    return min(ts)

def bench(b, h, w, c_):
    k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, c_, c_),
                          jnp.bfloat16) * 0.05
    l8, l40 = make_loop(8), make_loop(40)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c_), jnp.bfloat16)
    jax.device_get(l8(x, k)); jax.device_get(l40(x, k))
    wd.alive()
    dt = (timed(l40, b, h, w, c_, k) - timed(l8, b, h, w, c_, k)) / 32
    fl = 2 * b * h * w * 9 * c_ * c_
    byt = b * h * w * ((c_ + 127) // 128) * 128 * 2 * 2
    print(f"({b},{h},{w},{c_}) 3x3: {dt*1e3:7.3f} ms/it  "
          f"{fl/dt/1e12:6.1f} TFLOP/s  ~{byt/dt/1e9:5.0f} GB/s phys",
          flush=True)

for (h, c) in [(320, 48), (320, 128), (160, 48), (160, 128),
               (80, 96), (80, 128), (40, 192), (20, 384)]:
    bench(16, h, h, c)
wd.stop()
