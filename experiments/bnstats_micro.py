"""How fast is a BatchNorm batch-stats pass (mean + var over B,H,W)
on the train step's real shapes, in isolation?

The train-step profile (profile_step.py / xplane_ops.py) shows
convert_reduce_fusion ops — bf16->f32 convert + (sum, sum_sq) reduce —
at ~46% of step time, running at ~80-100 GB/s effective.  If the same
pass is fast in isolation, the in-context slowness is HBM contention
(total traffic is the lever); if it is slow alone, the fusion itself
is the lever (e.g. a Pallas stats kernel).

Run: timeout 400 python experiments/bnstats_micro.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def chain_time(fn, x, reps=30):
    """Scan-chained timing (data dependency defeats overlap/dedup).

    The operand is a stack of ``nbuf`` copies totalling >VMEM, indexed
    round-robin with dynamic_slice, so every iteration's read misses
    VMEM and pays real HBM traffic (a single carried buffer of these
    shapes fits in the 128 MB VMEM and times as ~free)."""
    vmem = 128 * 1024 * 1024
    nbuf = max(2, int(2 * vmem // x.nbytes) + 1)
    xs = jnp.stack([x + i for i in range(nbuf)])

    def loop(bufs):
        def body(c, i):
            # data-dependent index: the algebraic simplifier hoisted a
            # loop-invariant reduce when the index was a pure function
            # of i (sum(x+c) = sum(x) + c*N folds the pass away)
            idx = (i + c.astype(jnp.int32)) % nbuf
            xi = jax.lax.dynamic_index_in_dim(bufs, idx, 0,
                                              keepdims=False)
            outs = fn(xi)
            bump = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return (bump * 1e-12).astype(jnp.float32), bump
        _, s = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                            jnp.arange(reps))
        return s
    c = jax.jit(loop).lower(xs).compile()
    # device_get, not block_until_ready: on the tunneled backend the
    # latter returns without a round trip and times everything as ~0
    jax.device_get(c(xs))
    t0 = time.time()
    jax.device_get(c(xs))
    return (time.time() - t0) / reps * 1e3


def stats(x):
    """flax-BN-style: f32 mean + var over (B, H, W)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    return mean, var


def main():
    rng = np.random.RandomState(0)
    print(f"backend: {jax.devices()[0].platform}", flush=True)
    shapes = [
        (16, 113, 113, 40),
        (16, 113, 113, 163),
        (16, 113, 113, 128),
        (16, 112, 112, 128),
        (16, 113, 113, 20),
        (16, 225, 225, 50),
    ]
    for shp in shapes:
        x = jnp.asarray(rng.rand(*shp).astype(np.float32)
                        ).astype(jnp.bfloat16)
        ms = chain_time(stats, x)
        logical = np.prod(shp) * 2
        c_pad = -(-shp[-1] // 128) * 128
        phys = np.prod(shp[:-1]) * c_pad * 2
        print(f"{str(shp):22s} {ms:7.3f} ms  "
              f"logical {logical / ms / 1e6:6.1f} GB/s  "
              f"physical {phys / ms / 1e6:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
