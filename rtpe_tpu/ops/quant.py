"""Symmetric int8 quantization for the packed serving path.

TPU v5e executes s8 x s8 -> s32 on the MXU at twice the bf16 rate
(measured in-tree: a packed-branch-shaped 3x3x96x96 conv chain runs
1.46x faster end-to-end, including requantization).  The scheme here is
the standard production-serving one:

* **weights**: per-output-channel symmetric int8
  (``w_q = round(w / s_w)``, ``s_w = max|w| / 127`` per channel) —
  computed once at load time from the BN-folded packed weights;
* **activations**: per-tensor symmetric int8 with **static** scales
  collected by a calibration pass (``models/hrnet_packed.py:
  calibrate_act_scales``) — quantize is one fused elementwise op, no
  runtime reductions on the hot path;
* **accumulation**: int32 on the MXU, dequantized straight into the
  fp32 bias add (``y = y_i32 * (s_x * s_w) + b``), so each conv still
  emits the same fp32 pre-activation the bf16 path produces, just with
  ~2^-7-granular inputs.

Zero-point is 0 everywhere (symmetric), so border zero-padding and the
packed-row layout transforms stay exact.  Reference context: the
reference serves fp16 (``rtpe/fp16_utils``); int8 is this framework's
opt-in step further — the bf16 path remains the parity surface.
"""

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["QConv", "quantize_weight", "quantize_act", "qconv"]


class QConv(NamedTuple):
    """A quantized conv layer: int8 kernel + dequant scales + f32 bias.

    ``inv_sy`` (optional) is the OUTPUT tensor's inverse scale
    (127 / output_absmax), calibrated only for fuse-layer convs whose
    results feed an elementwise accumulation rather than another conv:
    with it, ``packed_forward(int8_act=True)`` stores those operands
    int8 too (the census in ``experiments/int8act_bytes.py`` showed
    they were the dominant remaining bf16 traffic on the int8-act
    path)."""
    kernel: jax.Array      # int8, HWIO
    bias: jax.Array        # f32, (cout,)
    alpha: jax.Array       # f32, (cout,): s_x * s_w dequant factor
    inv_sx: jax.Array      # f32, scalar: 127 / act_absmax
    inv_sy: Any = None     # f32 scalar or None: 127 / out_absmax


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: returns ``(w_q, s_w)`` with
    ``w ≈ w_q * s_w`` and ``s_w`` shaped (cout,)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=(0, 1, 2))
    s_w = jnp.maximum(absmax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / s_w), -127, 127
                   ).astype(jnp.int8)
    return w_q, s_w


def quantize_act(x: jax.Array, inv_sx: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 with a static scale (one fused
    elementwise op; XLA folds it into the producing activation)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv_sx),
                    -127, 127).astype(jnp.int8)


def qconv(x: jax.Array, q: QConv, strides, padding,
          lhs_dilation=None, flip: bool = False) -> jax.Array:
    """int8 conv + dequant + bias: same contract as the bf16 helpers in
    ``ops/rowpack.py`` (f32 result, caller applies activation/cast).

    An already-int8 input is consumed directly: the int8-activation
    graph (``packed_forward(int8_act=True)``) stores inter-layer
    tensors pre-quantized with this conv's own static scale, so
    ``alpha`` dequantizes identically."""
    xq = x if x.dtype == jnp.int8 else quantize_act(x, q.inv_sx)
    k = jnp.flip(q.kernel, axis=(0, 1)) if flip else q.kernel
    y = jax.lax.conv_general_dilated(
        xq, k, strides, padding,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * q.alpha + q.bias
