"""Does the v5e MXU actually double its rate on s8 x s8 for the
serving convs? (VERDICT r4 item 4: int8-act sits at 58% of the int8
peak "with neither roofline binding" — name the binding factor.)

Differential scan timing (40-iter minus 8-iter, same pattern as
conv_micro.py — removes dispatch overhead and the relay cache) of the
EXACT dominant serving conv shape, in three precisions:

  bf16  : bf16 conv -> relu (the bf16 packed path's inner op)
  s8    : s8 x s8 -> s32 conv -> dequant(alpha) + relu + requantize
          to s8 (the int8-act path's whole fused layer)
  s8raw : s8 x s8 -> s32 conv alone (no epilogue) — isolates the MXU
          rate from the VPU requantize cost

If s8raw ~= bf16 in wall time, the int8 MXU pass delivers no
FLOP-rate advantage at these channel counts and the int8-act win is
pure HBM-byte diet; if s8raw is ~2x faster, the requantize epilogue
is the binder.

Run: python experiments/int8_conv_micro.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def make_loop(scan, mode, c):
    """Chained conv stack in the given precision mode."""

    def body_bf16(carry, k, alpha):
        y = jax.lax.conv_general_dilated(
            carry, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)
        return jnp.maximum(y, 0) * jnp.bfloat16(0.1)

    def body_s8(carry, k, alpha):
        y = jax.lax.conv_general_dilated(
            carry, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        f = jnp.maximum(y.astype(jnp.float32) * alpha, 0.0)
        return jnp.clip(jnp.round(f * 12.7), -127, 127
                        ).astype(jnp.int8)

    def body_s8raw(carry, k, alpha):
        y = jax.lax.conv_general_dilated(
            carry, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        # cheapest legal chain back to s8: shift keeps it integer-only
        return (y >> 7).astype(jnp.int8)

    body = {"bf16": body_bf16, "s8": body_s8, "s8raw": body_s8raw}[mode]

    def loop(x, k, alpha):
        def step(c, _):
            return body(c, k, alpha), ()
        c, _ = jax.lax.scan(step, x, None, length=scan)
        return jnp.sum(c.astype(jnp.float32))

    return jax.jit(loop)


def timed(loop, x, k, alpha):
    ts = []
    for t in range(3):
        x2 = x + jnp.asarray(t % 2, x.dtype)  # distinct inputs
        jax.device_get(jnp.sum(x2.astype(jnp.float32)))
        t0 = time.time()
        jax.device_get(loop(x2, k, alpha))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def bench(mode, b, h, w, c):
    if mode == "bf16":
        x = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(0), (3, 3, c, c),
                              jnp.bfloat16) * 0.05
    else:
        x = jax.random.randint(jax.random.PRNGKey(1), (b, h, w, c),
                               -127, 128, jnp.int8)
        k = jax.random.randint(jax.random.PRNGKey(0), (3, 3, c, c),
                               -8, 9, jnp.int8)
    alpha = jnp.float32(1e-3)
    l8, l40 = make_loop(8, mode, c), make_loop(40, mode, c)
    jax.device_get(l8(x, k, alpha))
    jax.device_get(l40(x, k, alpha))
    dt = (timed(l40, x, k, alpha) - timed(l8, x, k, alpha)) / 32
    fl = 2 * b * h * w * 9 * c * c
    peak = 197.0 if mode == "bf16" else 394.0
    print(f"  {mode:6s} ({b},{h},{w},{c}) 3x3: {dt * 1e3:7.2f} ms/conv "
          f"{fl / dt / 1e12:6.1f} T{'FLOP' if mode == 'bf16' else 'OP'}/s "
          f"({100 * fl / dt / 1e12 / peak:4.1f}% of peak)", flush=True)
    return dt


if __name__ == "__main__":
    # the dominant serving conv: packed high-res branch 3x3, 96 ch
    for mode in ("bf16", "s8", "s8raw"):
        bench(mode, 128, 160, 320, 96)
    # lane-exact control: 256 channels (int8's deeper tiles fillable)
    for mode in ("bf16", "s8", "s8raw"):
        bench(mode, 128, 80, 160, 256)
