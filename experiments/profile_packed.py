import glob, os, shutil, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rtpe_tpu.models import PoseHigherHRNet, w48_config
from rtpe_tpu.models.hrnet_packed import pack_w48_params, packed_forward

BS = 16
OUT = "/tmp/rtpe_prof_packed"
shutil.rmtree(OUT, ignore_errors=True)
cfg = w48_config()
model = PoseHigherHRNet(cfg=cfg, dtype=jnp.bfloat16)
v = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False))()
pk = jax.jit(lambda v: pack_w48_params(v, cfg))(v)
fwd = jax.jit(lambda pk, x: packed_forward(pk, x, cfg))
x = jax.random.normal(jax.random.PRNGKey(1), (BS, 640, 640, 3), jnp.float32)
jax.block_until_ready(fwd(pk, x))
print("compiled", flush=True)
jax.profiler.start_trace(OUT)
for t in range(3):
    x2 = jax.random.normal(jax.random.PRNGKey(50 + t), (BS, 640, 640, 3),
                           jnp.float32)
    jax.block_until_ready(fwd(pk, x2))
jax.profiler.stop_trace()
print("traced", flush=True)
