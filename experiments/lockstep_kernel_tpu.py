"""TPU check of the LOCKSTEP grouping kernel (grid=(J,), batch on
sublanes) vs the grid=(B,J) greedy mega-kernel: compiled row-for-row
parity and chain-differenced timing on crowded batch-32 scenes."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rtpe_tpu.ops.pallas_group import match_by_tag_kernel
from rtpe_tpu.ops.pallas_group_lockstep import match_by_tag_lockstep

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
rng = np.random.default_rng(0)
J, K, D = 17, 30, 1
# crowded-noise: ~5 tag clusters + noise, most rows above threshold
centers = np.linspace(-6, 6, 5)
tags = (centers[rng.integers(0, 5, size=(B, J, K, D))]
        + rng.normal(size=(B, J, K, D)) * 0.3).astype(np.float32)
locs = rng.uniform(0, 320, size=(B, J, K, 2)).astype(np.float32)
vals = rng.uniform(-0.2, 1.0, size=(B, J, K)).astype(np.float32)
vals.sort(axis=-1); vals = vals[..., ::-1].copy()  # top-k ordering
tj, lj, vj = jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals)

t0 = time.time()
p_g, n_g = match_by_tag_kernel(tj, lj, vj, solver="greedy")
p_g.block_until_ready()
print(f"greedy grid=(B,J) compile+run: {time.time()-t0:.1f}s")

t0 = time.time()
p_l, n_l = match_by_tag_lockstep(tj, lj, vj)
p_l.block_until_ready()
print(f"lockstep grid=(J,)  compile+run: {time.time()-t0:.1f}s")

ok = (np.array_equal(np.asarray(n_g), np.asarray(n_l))
      and np.allclose(np.asarray(p_g), np.asarray(p_l), atol=1e-4))
print("parity:", "OK" if ok else "MISMATCH")
if not ok:
    nb = int(np.sum(np.asarray(n_g) != np.asarray(n_l)))
    print("  n_people mismatches:", nb)
    db = np.max(np.abs(np.asarray(p_g) - np.asarray(p_l)), axis=(1, 2, 3))
    print("  worst-img people diff:", float(db.max()), "at", int(db.argmax()))

def chain(n, fn):
    @jax.jit
    def run(t, l, v):
        def body(i, carry):
            t, acc = carry
            p, np_ = fn(t, l, v)
            return t + p[0, 0, 0, 0] * 1e-9, acc + np_[0]
        return jax.lax.fori_loop(0, n, body, (t, jnp.int32(0)))
    return run

for name, fn in [
        ("greedy(B,J)", lambda t, l, v: match_by_tag_kernel(t, l, v, solver="greedy")),
        ("lockstep(J,)", lambda t, l, v: match_by_tag_lockstep(t, l, v))]:
    r2, r12 = chain(2, fn), chain(12, fn)
    r2(tj, lj, vj)[1].block_until_ready()
    r12(tj, lj, vj)[1].block_until_ready()
    ts2, ts12 = [], []
    for _ in range(5):
        t0 = time.time(); r2(tj, lj, vj)[1].block_until_ready(); ts2.append(time.time() - t0)
        t0 = time.time(); r12(tj, lj, vj)[1].block_until_ready(); ts12.append(time.time() - t0)
    per = (np.median(ts12) - np.median(ts2)) / 10
    print(f"{name}: {per*1e3:.2f} ms per batch-{B} grouping "
          f"= {per/B*1e3:.3f} ms/img")
