"""Reproduce the r4 decode_fused32 dead-code artifact (VERDICT r4
item 3: 0.54 claimed vs 1.06 measured).

The 0.54 ms/img record came from batteries run BEFORE commit 8bed1ee
(2026-08-20 08:07), whose section body returned only ``jnp.sum(n)`` —
``n`` and ``scores`` are computed before the refine stage, so XLA
dead-code-eliminated the refine (~45-50% of decode) out of the timed
program.  8bed1ee fixed the hole but the section was never re-measured
before the round closed, so README/TODO kept the stale number.

This runs BOTH bodies back to back on the chip: the fixed body should
measure ~1.06 ms/img and the pre-fix body ~0.54 — proving the gap is
the refine stage's live/dead status, not service variance, solver
demotion, or a regression.

Run: python experiments/decode_dce_check.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("RTPE_LAP_SELFCHECK", "0")

import jax
import jax.numpy as jnp
import numpy as np

from rtpe_tpu.decode.fused import decode_full_batch

SCAN_LEN = 10


def make_crowded(rng2, b):
    det = np.clip(rng2.rand(b, 320, 320, 17) * 0.2, 0, 1
                  ).astype(np.float32)
    for bi in range(b):
        for _ in range(6):
            i, j = rng2.randint(5, 310, 2)
            det[bi, i:i + 3, j:j + 3, :] = rng2.rand() * 0.5 + 0.5
    tag = (rng2.randn(b, 320, 320, 17) * 0.1).astype(np.float32)
    return det, tag


def run(live_refine):
    rng2 = np.random.RandomState(7)
    Bd = 32
    det, tag = make_crowded(rng2, Bd)
    dj, tj = jnp.asarray(det), jnp.asarray(tag)

    def loop(d0, t0_):
        def body(d, _):
            people, n, scores = decode_full_batch(d, t0_)
            d = d + (jnp.sum(scores) * 1e-9).astype(d.dtype)
            if live_refine:  # post-8bed1ee body: refine output is live
                return d, jnp.sum(people) + jnp.sum(n).astype(
                    people.dtype)
            return d, jnp.sum(n)  # pre-fix body: refine is dead code
        _, outs = jax.lax.scan(body, d0, None, length=SCAN_LEN)
        return outs

    c = jax.jit(loop).lower(dj, tj).compile()
    jax.device_get(c(dj, tj))
    times = []
    for t in range(5):
        d2 = jnp.asarray(det + (rng2.rand(*det.shape) * 1e-4
                                ).astype(np.float32))
        jax.device_get(jnp.sum(d2))
        t0 = time.time()
        jax.device_get(c(d2, tj))
        times.append(time.time() - t0)
    ms = float(np.median(times)) / SCAN_LEN / Bd * 1e3
    tag_s = "live-refine (fixed body)" if live_refine else \
        "dead-refine (pre-8bed1ee body)"
    print(f"{tag_s}: {ms:.2f} ms/img  reps="
          f"{[round(x / SCAN_LEN / 32 * 1e3, 2) for x in times]}",
          flush=True)
    return ms


if __name__ == "__main__":
    live = run(True)
    dead = run(False)
    print(f"refine share of decode: {100 * (1 - dead / live):.1f}%")
