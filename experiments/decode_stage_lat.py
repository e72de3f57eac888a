"""Stage-wise device-only latency of the single-image fused decode.

VERDICT r3 item 3 wants decode_device_p50_ms_320 <= 5 ms; r3 measured
9.6 ms.  This decomposes the fused program into cumulative prefixes —
(a) NMS+top-k, (b) +grouping mega-kernel, (c) +adjust+refine — each
scan-chained with a data dependency so the tunnel round trip divides
out.  Stage cost = difference of consecutive prefixes.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rtpe_tpu.decode.fused import decode_full
from rtpe_tpu.decode.nms import top_k
from rtpe_tpu.ops import pallas_group

SCAN = 10


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
    rng = np.random.RandomState(0)
    det = np.clip(rng.rand(1, 320, 320, 17) * 0.2, 0, 1
                  ).astype(np.float32)
    det[0, 100:103, 100:103, :] = 1.0
    tag = np.zeros((1, 320, 320, 17), np.float32)
    dj, tj = jnp.asarray(det), jnp.asarray(tag)

    def s_topk(d, t):
        val_k, loc_k, tag_k = top_k(d, t, 30, 5, 2, True)
        return jnp.sum(val_k) + jnp.sum(loc_k) + jnp.sum(tag_k)

    def s_group(d, t):
        val_k, loc_k, tag_k = top_k(d, t, 30, 5, 2, True)
        people, n = pallas_group.match_by_tag_kernel(
            tag_k, loc_k, val_k, max_num_people=30, p_max=90)
        return jnp.sum(people) + n.sum().astype(jnp.float32)

    def s_full(d, t):
        people, n, scores = decode_full(d, t, lap="kernel")
        return jnp.sum(people) + jnp.sum(scores)

    ms_topk = timed(s_topk, dj, tj)
    print(f"top_k only:            {ms_topk:6.2f} ms", flush=True)
    ms_group = timed(s_group, dj, tj)
    print(f"+ grouping kernel:     {ms_group:6.2f} ms "
          f"(grouping ~{ms_group - ms_topk:.2f})", flush=True)
    ms_full = timed(s_full, dj, tj)
    print(f"+ adjust/refine:       {ms_full:6.2f} ms "
          f"(tail ~{ms_full - ms_group:.2f})", flush=True)


if __name__ == "__main__":
    main()
