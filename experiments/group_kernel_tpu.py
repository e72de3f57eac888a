"""TPU check of the grouping mega-kernel: correctness vs match_by_tag_jit
and chain-differenced timing vs the current per-joint path."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rtpe_tpu.decode.group_jit import match_by_tag_jit
from rtpe_tpu.ops.pallas_group import match_by_tag_kernel

rng = np.random.default_rng(0)
B, J, K, D = 8, 17, 30, 1
tags = (rng.normal(size=(B, J, K, D)) * 2).astype(np.float32)
locs = rng.uniform(0, 320, size=(B, J, K, 2)).astype(np.float32)
vals = rng.uniform(-0.2, 1.0, size=(B, J, K)).astype(np.float32)
tj, lj, vj = jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals)

t0 = time.time()
p_k, n_k = match_by_tag_kernel(tj, lj, vj)
p_k.block_until_ready()
print(f"kernel compile+run: {time.time()-t0:.1f}s")

bad = 0
for b in range(B):
    p_ref, n_ref = match_by_tag_jit(tj[b], lj[b], vj[b], lap="pallas")
    ok = np.allclose(np.asarray(p_ref), np.asarray(p_k[b]), atol=1e-4) \
        and int(n_ref) == int(n_k[b])
    if not ok:
        bad += 1
        print("MISMATCH img", b, int(n_ref), int(n_k[b]))
print("correctness:", "OK" if bad == 0 else f"{bad} bad")

# chain-differenced timing: run the kernel N times data-dependently
def chain(n, fn):
    @jax.jit
    def run(t, l, v):
        def body(i, carry):
            t, acc = carry
            p, np_ = fn(t, l, v)
            return t + p[0, 0, 0, 0] * 1e-9, acc + np_[0]
        return jax.lax.fori_loop(0, n, body, (t, jnp.int32(0)))
    return run

for name, fn in [("mega-kernel", lambda t, l, v: match_by_tag_kernel(t, l, v))]:
    r2 = chain(2, fn); r12 = chain(12, fn)
    o = r2(tj, lj, vj)[1].block_until_ready()
    o = r12(tj, lj, vj)[1].block_until_ready()
    ts2, ts12 = [], []
    for _ in range(5):
        t0 = time.time(); r2(tj, lj, vj)[1].block_until_ready(); ts2.append(time.time()-t0)
        t0 = time.time(); r12(tj, lj, vj)[1].block_until_ready(); ts12.append(time.time()-t0)
    per = (np.median(ts12) - np.median(ts2)) / 10
    print(f"{name}: {per*1e3:.2f} ms per batch-{B} grouping "
          f"= {per/B*1e3:.3f} ms/img")
