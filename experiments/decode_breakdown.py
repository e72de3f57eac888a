import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rtpe_tpu.decode import HeatmapParser

# dispatch floor: trivial jit call + device_get
f = jax.jit(lambda x: x + 1)
x = jnp.zeros((8, 8))
jax.device_get(f(x))
ts = []
for _ in range(10):
    t0 = time.time(); jax.device_get(f(x)); ts.append(time.time() - t0)
print(f"trivial jit+get round trip p50: {np.median(ts)*1e3:.1f} ms")

parser = HeatmapParser(num_joints=17, max_num_people=30)
rng = np.random.RandomState(0)
B = 8
det = np.clip(rng.rand(B, 320, 320, 17) * 0.2, 0, 1).astype(np.float32)
det[:, 100:103, 100:103, :] = 1.0
# a few more peaks so grouping has work
for b in range(B):
    for p in range(6):
        i, j = rng.randint(5, 310, 2)
        det[b, i:i+3, j:j+3, :] = rng.rand()*0.5 + 0.5
tag = rng.randn(B, 320, 320, 17).astype(np.float32) * 0.1
dj, tj = jnp.asarray(det), jnp.asarray(tag)

# top_k only
parser.top_k(dj, tj)
ts = []
for _ in range(8):
    t0 = time.time(); vk, lk, tk = parser.top_k(dj, tj); ts.append(time.time()-t0)
print(f"top_k(B={B}) p50: {np.median(ts)*1e3:.1f} ms")

# host matching only
ts = []
for _ in range(8):
    t0 = time.time(); ans = parser.match(vk, lk, tk); ts.append(time.time()-t0)
print(f"match(B={B}) host p50: {np.median(ts)*1e3:.1f} ms "
      f"({len(ans[0])} people img0)")

# adjust+refine host, per image
from rtpe_tpu.decode.parser import adjust_people, refine_person
t0 = time.time()
for b in range(B):
    people = adjust_people(ans[b], det[b])
    tag_img = tag[b].reshape(320, 320, 17, 1)
    for i in range(len(people)):
        people[i] = refine_person(det[b], tag_img, people[i])
print(f"adjust+refine host (B={B}): {(time.time()-t0)*1e3:.1f} ms total")

# full parse per image (current contract)
parser.parse(dj[:1], tj[:1])
ts = []
for _ in range(8):
    t0 = time.time(); parser.parse(dj[:1], tj[:1]); ts.append(time.time()-t0)
print(f"parse(B=1) p50: {np.median(ts)*1e3:.1f} ms")
