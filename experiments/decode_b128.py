"""Does batch-128 fused decode cost more PER IMAGE than batch-32?

The honest r5 pipeline numbers imply decode+epilogue ~1.78 ms/img at
bs128 while the decode section measures 1.07 ms/img at bs32.  If the
lockstep kernel's per-image cost rises with B (top-k tournament and
refine envelope scale superlinearly per image), a lax.map over 32-image
chunks inside the same jit should restore the bs32 rate.

Run: python experiments/decode_b128.py
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


def run(B, chunk=None):
    rng2 = np.random.RandomState(7)
    det, tag = make_crowded(rng2, B)
    dj, tj = jnp.asarray(det), jnp.asarray(tag)

    def decode(d, t):
        if chunk is None:
            return decode_full_batch(d, t)
        nb = d.shape[0] // chunk
        dc = d.reshape(nb, chunk, *d.shape[1:])
        tc = t.reshape(nb, chunk, *t.shape[1:])
        people, n, scores = jax.lax.map(
            lambda ab: decode_full_batch(ab[0], ab[1]), (dc, tc))
        return (people.reshape(B, *people.shape[2:]),
                n.reshape(B), scores.reshape(B, *scores.shape[2:]))

    def loop(d0, t0_):
        def body(d, _):
            people, n, scores = decode(d, t0_)
            d = d + (jnp.sum(scores) * 1e-9).astype(d.dtype)
            return d, jnp.sum(people) + jnp.sum(n).astype(people.dtype)
        _, outs = jax.lax.scan(body, d0, None, length=SCAN_LEN)
        return outs

    t0 = time.time()
    c = jax.jit(loop).lower(dj, tj).compile()
    jax.device_get(c(dj, tj))
    compile_s = time.time() - t0
    times = []
    for t in range(5):
        d2 = jnp.asarray(det + (rng2.rand(*det.shape) * 1e-4
                                ).astype(np.float32))
        jax.device_get(jnp.sum(d2))
        t0 = time.time()
        jax.device_get(c(d2, tj))
        times.append(time.time() - t0)
    ms = float(np.median(times)) / SCAN_LEN / B * 1e3
    tagc = f"chunk={chunk}" if chunk else "whole"
    print(f"B={B:4d} {tagc:9s}: {ms:5.2f} ms/img "
          f"({1e3 / ms:.0f} img/s; compile {compile_s:.0f}s)",
          flush=True)


if __name__ == "__main__":
    # one config per process: the whole-128 program's compile measured
    # >20 min on the degraded service (the B=128 lockstep+refine
    # program is pathological to compile — itself a finding), and a
    # wedge must not take the other configs down with it
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("all", "whole"):
        run(128)
    if mode in ("all", "chunk"):
        run(128, chunk=32)
    if mode in ("all", "b32"):
        run(32)
