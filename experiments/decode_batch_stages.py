"""Stage-wise device-only latency of the BATCH fused decode at B=32.

With the lockstep grouping kernel the grouping stage is ~0.02 ms/img;
this decomposes the remaining ~1.65 ms/img into cumulative prefixes —
(a) NMS+top-k, (b) +lockstep grouping (+XLA people reconstruction),
(c) +vmapped adjust+refine tail — each scan-chained with a data
dependency so the tunnel round trip divides out.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtpe_tpu.decode.fused import decode_full_batch
from rtpe_tpu.decode.nms import top_k
from rtpe_tpu.decode.refine_device import adjust_refine_device
from rtpe_tpu.ops.pallas_group_lockstep import match_by_tag_lockstep

SCAN = 10
B = 32


def timed(fn, d0, t0_):
    def loop(d, t):
        def body(c, _):
            out = fn(c, t)
            c = c + (out * 1e-9).astype(c.dtype)
            return c, out
        _, outs = jax.lax.scan(body, d, None, length=SCAN)
        return outs

    c = jax.jit(loop).lower(d0, t0_).compile()
    jax.device_get(c(d0, t0_))
    ts = []
    rng = np.random.RandomState(3)
    for _ in range(5):
        d2 = d0 + jnp.asarray(rng.rand(*d0.shape).astype(np.float32)
                              * 1e-4)
        jax.device_get(jnp.sum(d2))
        t0 = time.time()
        jax.device_get(c(d2, t0_))
        ts.append(time.time() - t0)
    return float(np.median(ts)) / SCAN * 1e3


def main():
    rng2 = np.random.RandomState(7)
    det = np.clip(rng2.rand(B, 320, 320, 17) * 0.2, 0, 1
                  ).astype(np.float32)
    for bi in range(B):
        for _ in range(6):
            i, j = rng2.randint(5, 310, 2)
            det[bi, i:i + 3, j:j + 3, :] = rng2.rand() * 0.5 + 0.5
    tag = (rng2.randn(B, 320, 320, 17) * 0.1).astype(np.float32)
    dj, tj = jnp.asarray(det), jnp.asarray(tag)
    j = 17

    def pfx_topk(d, t):
        val_k, loc_k, tag_k = top_k(d, t, 30, 5, 2, True,
                                    use_pallas=False)
        return jnp.sum(val_k) + jnp.sum(loc_k) + jnp.sum(tag_k)

    def pfx_group(d, t):
        val_k, loc_k, tag_k = top_k(d, t, 30, 5, 2, True,
                                    use_pallas=False)
        people, n = match_by_tag_lockstep(tag_k, loc_k, val_k)
        return jnp.sum(people) + jnp.sum(n)

    def pfx_full(d, t):
        people, n, scores = decode_full_batch(d, t, lap="lockstep")
        return jnp.sum(people) + jnp.sum(scores)

    t_a = timed(pfx_topk, dj, tj)
    t_b = timed(pfx_group, dj, tj)
    t_c = timed(pfx_full, dj, tj)
    print(f"B={B} crowded 320px, ms per BATCH (ms/img):")
    print(f"  (a) nms+top-k        : {t_a:8.2f}  ({t_a/B:.3f})")
    print(f"  (b) +lockstep group  : {t_b:8.2f}  ({t_b/B:.3f})"
          f"   stage = {t_b-t_a:.2f}")
    print(f"  (c) +adjust/refine   : {t_c:8.2f}  ({t_c/B:.3f})"
          f"   stage = {t_c-t_b:.2f}")


if __name__ == "__main__":
    main()
