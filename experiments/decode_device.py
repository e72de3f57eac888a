import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rtpe_tpu.decode import HeatmapParser

parser = HeatmapParser(num_joints=17, max_num_people=30)
rng = np.random.RandomState(0)
B = 8
det = np.clip(rng.rand(B, 320, 320, 17) * 0.2, 0, 1).astype(np.float32)
det[:, 100:103, 100:103, :] = 1.0
for b in range(B):
    for p in range(6):
        i, j = rng.randint(5, 310, 2)
        det[b, i:i+3, j:j+3, :] = rng.rand()*0.5 + 0.5
tag = rng.randn(B, 320, 320, 17).astype(np.float32) * 0.1
dj, tj = jnp.asarray(det), jnp.asarray(tag)

# forced on-device adjust+refine path, single image
parser.parse(dj[:1], tj[:1], on_device=True)
ts = []
for _ in range(8):
    t0 = time.time(); parser.parse(dj[:1], tj[:1], on_device=True)
    ts.append(time.time()-t0)
print(f"parse(B=1, on_device) p50: {np.median(ts)*1e3:.1f} ms")

# fused full decode, single image
t0 = time.time()
out = parser.parse_fused(dj[:1], tj[:1])
print(f"parse_fused compile+1st: {time.time()-t0:.1f}s "
      f"({len(out[0][0])} people)")
ts = []
for _ in range(8):
    t0 = time.time(); parser.parse_fused(dj[:1], tj[:1])
    ts.append(time.time()-t0)
print(f"parse_fused(B=1) p50: {np.median(ts)*1e3:.1f} ms")
