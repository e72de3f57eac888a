"""Pallas TPU kernel: fused max-pool NMS + top-k peak extraction.

The decode hot path (reference ``group.py:132-179``) is NMS-by-max-pool
followed by a per-joint top-k.  The XLA fallback in ``decode/nms.py``
materializes the pooled and suppressed maps in HBM between ops; this
kernel keeps one (H, W) heatmap plane resident in VMEM and does both
steps in a single pass per (batch*joint) grid cell:

1. k×k max-pool via shifted-window max on the VMEM tile (VPU ops),
2. peak mask (pool == value) and suppression,
3. iterative top-k (k = max_people): plane max, first-flat-index argmax
   (torch.topk tie order), mask, repeat.

Outputs ``val (B, J, K)``, ``x (B, J, K)``, ``y (B, J, K)``; tag
gathering stays outside (a cheap take_along_axis on the XLA side).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_topk_kernel(det_ref, val_ref, x_ref, y_ref, *, ksize: int,
                     max_people: int):
    det = det_ref[0]  # (h, w) fp32 in VMEM
    h, w = det.shape
    neg = jnp.float32(-jnp.inf)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    half = ksize // 2

    # k×k same-padding max pool, separable (k×1 then 1×k): 4·half
    # shifted maxima instead of k²-1, keeping the VMEM working set
    # small enough for 640×640 planes.
    # pltpu.roll needs non-negative shifts; (size - s) % size == -s.
    pooled = det
    for dx in range(1, half + 1):
        left = pltpu.roll(det, dx % w, 1)
        right = pltpu.roll(det, (-dx) % w, 1)
        pooled = jnp.maximum(
            pooled, jnp.where(col_ids - dx >= 0, left, neg))
        pooled = jnp.maximum(
            pooled, jnp.where(col_ids + dx < w, right, neg))
    ph = pooled
    for dy in range(1, half + 1):
        up = pltpu.roll(ph, dy % h, 0)
        down = pltpu.roll(ph, (-dy) % h, 0)
        pooled = jnp.maximum(
            pooled, jnp.where(row_ids - dy >= 0, up, neg))
        pooled = jnp.maximum(
            pooled, jnp.where(row_ids + dy < h, down, neg))

    peaks = jnp.where(pooled == det, det, jnp.float32(0.0))
    flat_idx = row_ids * w + col_ids

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_row0 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0

    def body(i, carry):
        cur, vals, xs, ys = carry
        m = jnp.max(cur)
        idx = jnp.min(jnp.where(cur == m, flat_idx, jnp.int32(h * w)))
        # Mosaic has no dynamic_update_slice on values; select by lane id
        sel = out_row0 & (out_lane == i)
        vals = jnp.where(sel, m, vals)
        xs = jnp.where(sel, idx % w, xs)
        ys = jnp.where(sel, idx // w, ys)
        cur = jnp.where(flat_idx == idx, neg, cur)
        return cur, vals, xs, ys

    # output tiles are (8, 128) for TPU layout alignment; results live
    # in row 0, columns [0, max_people)
    init = (peaks,
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.int32),
            jnp.zeros((8, 128), jnp.int32))
    _, vals, xs, ys = jax.lax.fori_loop(0, max_people, body, init)
    val_ref[0, :, :] = vals
    x_ref[0, :, :] = xs
    y_ref[0, :, :] = ys


@partial(jax.jit, static_argnames=("max_people", "ksize", "interpret"))
def nms_topk_pallas(det: jax.Array, max_people: int = 30,
                    ksize: int = 5, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused NMS+top-k.  ``det`` (B, H, W, J) -> (val, x, y), each
    (B, J, K) with K = max_people."""
    b, h, w, j = det.shape
    det_bj = det.astype(jnp.float32).transpose(0, 3, 1, 2)
    det_bj = det_bj.reshape(b * j, h, w)

    kernel = partial(_nms_topk_kernel, ksize=ksize, max_people=max_people)
    val, x, y = pl.pallas_call(
        kernel,
        grid=(b * j,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * j, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * j, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((b * j, 8, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(det_bj)
    return (val[:, 0, :max_people].reshape(b, j, max_people),
            x[:, 0, :max_people].reshape(b, j, max_people),
            y[:, 0, :max_people].reshape(b, j, max_people))
