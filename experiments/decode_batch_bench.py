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
tag = (rng.randn(B, 320, 320, 17) * 0.1).astype(np.float32)
dj, tj = jnp.asarray(det), jnp.asarray(tag)

ans, sc = parser.parse_batch(dj, tj)   # compile
print("people img0:", len(ans[0]), flush=True)
ts = []
for _ in range(6):
    t0 = time.time(); parser.parse_batch(dj, tj); ts.append(time.time()-t0)
p50 = np.median(ts)
print(f"parse_batch(B={B}) p50: {p50*1e3:.1f} ms  -> {B/p50:.1f} img/s, "
      f"{p50/B*1e3:.1f} ms/img amortized")

# single image
parser.parse_batch(dj[:1], tj[:1])
ts = []
for _ in range(6):
    t0 = time.time(); parser.parse_batch(dj[:1], tj[:1]); ts.append(time.time()-t0)
print(f"parse_batch(B=1) p50: {np.median(ts)*1e3:.1f} ms")

# sparse fixture like old bench
det2 = np.clip(rng.rand(1, 320, 320, 17) * 0.2, 0, 1).astype(np.float32)
det2[0, 100:103, 100:103, :] = 1.0
tag2 = np.zeros((1, 320, 320, 17), np.float32)
d2, t2 = jnp.asarray(det2), jnp.asarray(tag2)
parser.parse_batch(d2, t2)
ts = []
for _ in range(8):
    t0 = time.time(); parser.parse_batch(d2, t2); ts.append(time.time()-t0)
print(f"parse_batch(B=1, sparse) p50: {np.median(ts)*1e3:.1f} ms")
