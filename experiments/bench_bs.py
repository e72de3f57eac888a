import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rtpe_tpu.models import PoseHigherHRNet, w48_config
from rtpe_tpu.models.hrnet_packed import pack_w48_params, packed_forward
from rtpe_tpu.utils.watchdog import CompileWatchdog

SCAN = 10
wd = CompileWatchdog(interval=90.0).start()
cfg = w48_config()
model = PoseHigherHRNet(cfg=cfg, dtype=jnp.bfloat16)
v = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False))()
pk = jax.jit(lambda v: pack_w48_params(v, cfg))(v)
wd.alive()

for bs in (192, 256):
    try:
        @jax.jit
        def loop(a, x):
            def body(c, _):
                coarse, refined = packed_forward(a, c, cfg)
                c = c + (jnp.mean(refined.astype(jnp.float32)) * 1e-9
                         ).astype(c.dtype)
                return c, jnp.sum(coarse.astype(jnp.float32))
            _, sums = jax.lax.scan(body, x, None, length=SCAN)
            return sums
        x = jax.random.normal(jax.random.PRNGKey(1), (bs, 640, 640, 3),
                              jnp.float32)
        t0 = time.time(); jax.device_get(loop(pk, x))
        print(f"bs={bs}: compile+1st {time.time()-t0:.1f}s", flush=True)
        wd.alive()
        ts = []
        for t in range(3):
            x2 = jax.random.normal(jax.random.PRNGKey(61 + t),
                                   (bs, 640, 640, 3), jnp.float32)
            jax.device_get(x2)
            t0 = time.time(); jax.device_get(loop(pk, x2))
            ts.append(time.time() - t0)
        dt = min(ts)
        print(f"bs={bs}: {bs*SCAN/dt:.1f} img/s ({dt/SCAN*1e3:.1f} ms/b)",
              flush=True)
    except Exception as e:
        print(f"bs={bs} failed: {str(e)[:150]}", flush=True)
wd.stop()
