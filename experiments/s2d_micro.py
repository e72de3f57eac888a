"""Does XLA:TPU pay the small-Cin lane padding on the image-level
convs — and does space-to-depth (s2d) recover it?

The physical-HLO model (train_hlo_physical.py) attributes ~82 GFLOP/img
of PHYSICAL MXU work to `fwd stem` + `fwd alt_stem_conv0` whose LOGICAL
cost is <1 GFLOP/img: a conv with Cin=3 pads its contraction to the
128-lane MXU tile.  s2d folds a stride-s conv's spatial stride into
channels — conv(k,k,s=2, Cin=3) on (H,W) == conv(ceil(k/2)... padded
even kernel, s=1 on (H/2, W/2, 12)) — multiplying Cin by s^2 at
identical logical output.  This microbench times the real shapes both
ways on the current backend; if s2d wins big, the train step gets an
exact-rewrite option.

Run: timeout 400 python experiments/s2d_micro.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=20):
    out = jax.jit(fn).lower(*args).compile()
    jax.device_get(out(*args))
    t0 = time.time()
    for _ in range(reps):
        r = out(*args)
    jax.device_get(r)  # tunneled backend: block_until_ready is a no-op
    return (time.time() - t0) / reps * 1e3


def conv(x, k, stride):
    return jax.lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def s2d(x, s):
    """(B,H,W,C) -> (B,H/s,W/s,C*s*s); channel = (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // s, s, w // s, s, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // s, w // s, s * s * c)


def s2d_kernel(k, s):
    """(kh,kw,ci,co) stride-s kernel -> (kh',kw', ci*s*s, co) stride-1
    on the s2d input.  kh' = ceil(kh/s); zero-pad kh to kh'*s first."""
    kh, kw, ci, co = k.shape
    kh2, kw2 = -(-kh // s) * s, -(-kw // s) * s
    k = jnp.pad(k, ((0, kh2 - kh), (0, kw2 - kw), (0, 0), (0, 0)))
    k = k.reshape(kh2 // s, s, kw2 // s, s, ci, co)
    return k.transpose(0, 2, 1, 3, 4, 5).reshape(
        kh2 // s, kw2 // s, s * s * ci, co)


def main():
    rng = np.random.RandomState(0)
    bs = 16
    print(f"backend: {jax.devices()[0].platform}", flush=True)

    cases = [
        # (name, H, Cin, Cout, k, stride)
        ("alt_stem_conv0 5x5 s2 3->50 @450", 448, 3, 50, 5, 2),
        ("stem conv 3x3 s2 3->64 @450", 448, 3, 64, 3, 2),
        ("stem conv 3x3 s2 64->64 @225", 224, 64, 64, 3, 2),
        ("alt_stem_conv1 5x5 s2 50->80 @225", 224, 50, 80, 5, 2),
    ]
    for name, h, ci, co, kk, s in cases:
        x = jnp.asarray(rng.rand(bs, h, h, ci).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.rand(kk, kk, ci, co).astype(np.float32) * .1
                        ).astype(jnp.bfloat16)
        t_dense = timeit(lambda a, b: conv(a, b, s), x, k)

        xs = s2d(x, s)
        ks = s2d_kernel(k, s)
        t_s2d = timeit(lambda a, b: conv(a, b, 1), xs, ks)

        # value check (fp32 ground truth)
        ref = conv(x.astype(jnp.float32), k.astype(jnp.float32), s)
        # SAME padding differs between the two formulations when kh is
        # odd; compare the interior only
        got = conv(xs.astype(jnp.float32), ks.astype(jnp.float32), 1)
        m = 4
        err = float(jnp.max(jnp.abs(ref[:, m:-m, m:-m] -
                                    got[:, m:-m, m:-m])))
        print(f"{name:38s} dense {t_dense:7.2f} ms  s2d {t_s2d:7.2f} ms"
              f"  ({t_dense / t_s2d:4.1f}x)  interior_err {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
