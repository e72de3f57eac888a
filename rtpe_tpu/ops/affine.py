"""Affine geometry: transform construction + batched on-device warping.

Replaces the reference's cv2-based host path:

* ``get_affine_transform`` reproduces the center/scale(×200)/rot
  construction of ``rtpe/third_party/transforms.py:59-93`` (including the
  third-point trick) without cv2 — the 3-point solve is done in numpy.
* ``affine_warp`` replaces ``cv2.warpAffine(..., INTER_LINEAR)``
  (``transforms.py:120-125,146-150,185-191``) with a batched, jittable
  bilinear sampler.  One (2, 3) matrix warps *all* planes of a sample at
  once — this is the TPU answer to the reference's per-channel PIL
  augmentation replay (``rtpe/dataloaders.py:300-308``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def solve_affine(src_pts: np.ndarray, dst_pts: np.ndarray) -> np.ndarray:
    """2x3 affine matrix mapping three src points to three dst points.

    Equivalent to ``cv2.getAffineTransform`` but a plain linear solve.
    """
    src = np.asarray(src_pts, dtype=np.float64)
    dst = np.asarray(dst_pts, dtype=np.float64)
    a = np.concatenate([src, np.ones((3, 1))], axis=1)  # (3, 3)
    # solve a @ m.T = dst  ->  m = (a^-1 dst)^T
    m = np.linalg.solve(a, dst).T  # (2, 3)
    return m.astype(np.float32)


def _get_dir(src_point, rot_rad):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return np.array([src_point[0] * cs - src_point[1] * sn,
                     src_point[0] * sn + src_point[1] * cs])


def _get_3rd_point(a, b):
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float32)


def get_affine_transform(center, scale, rot, output_size,
                         shift=(0.0, 0.0), inv=False) -> np.ndarray:
    """Reference-compatible affine from center/scale/rot to output box.

    Mirrors ``rtpe/third_party/transforms.py:59-93``: ``scale`` is in
    units of 200 px, ``rot`` in degrees, ``output_size`` is (w, h).
    """
    center = np.asarray(center, dtype=np.float32)
    shift = np.asarray(shift, dtype=np.float32)
    if not isinstance(scale, (np.ndarray, list, tuple)):
        scale = np.array([scale, scale])
    scale = np.asarray(scale, dtype=np.float32)

    scale_tmp = scale * 200.0
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size[0], output_size[1]

    rot_rad = np.pi * rot / 180.0
    src_dir = _get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale_tmp * shift
    src[1, :] = center + src_dir + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2:, :] = _get_3rd_point(src[0, :], src[1, :])
    dst[2:, :] = _get_3rd_point(dst[0, :], dst[1, :])

    if inv:
        return solve_affine(dst, src)
    return solve_affine(src, dst)


def invert_affine(m) -> np.ndarray:
    """Invert a (2, 3) affine matrix (host-side numpy)."""
    m = np.asarray(m, dtype=np.float64)
    a = m[:, :2]
    t = m[:, 2]
    ainv = np.linalg.inv(a)
    return np.concatenate([ainv, (-ainv @ t)[:, None]],
                          axis=1).astype(np.float32)


@partial(jax.jit, static_argnames=("out_hw",))
def affine_warp(x: jax.Array, matrix: jax.Array, out_hw):
    """Warp NHWC ``x`` with per-sample forward matrices, bilinear, 0-border.

    :param x: (B, H, W, C) input planes.
    :param matrix: (B, 2, 3) *forward* affine (src -> dst pixel coords),
      the same convention cv2.warpAffine takes; inversion happens here.
    :param out_hw: static (out_h, out_w).
    :returns: (B, out_h, out_w, C).
    """
    b, in_h, in_w, c = x.shape
    out_h, out_w = out_hw
    xf = x.astype(jnp.float32)

    # invert the forward matrices on device (closed form, batched)
    a = matrix[:, :, :2].astype(jnp.float32)          # (B, 2, 2)
    t = matrix[:, :, 2].astype(jnp.float32)           # (B, 2)
    det = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    det = jnp.where(det == 0, 1e-12, det)
    inv00 = a[:, 1, 1] / det
    inv01 = -a[:, 0, 1] / det
    inv10 = -a[:, 1, 0] / det
    inv11 = a[:, 0, 0] / det
    itx = -(inv00 * t[:, 0] + inv01 * t[:, 1])
    ity = -(inv10 * t[:, 0] + inv11 * t[:, 1])

    dst_x = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    dst_y = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)

    # per-batch source coordinates, (B, out_h, out_w)
    src_x = (inv00[:, None, None] * dst_x + inv01[:, None, None] * dst_y
             + itx[:, None, None])
    src_y = (inv10[:, None, None] * dst_x + inv11[:, None, None] * dst_y
             + ity[:, None, None])

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = src_x - x0
    fy = src_y - y0

    def gather(yi, xi):
        valid = ((xi >= 0) & (xi < in_w) & (yi >= 0) & (yi < in_h))
        xi_c = jnp.clip(xi, 0, in_w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, in_h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(xf, yi_c, xi_c)
        return vals * valid[..., None].astype(jnp.float32)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    fx = fx[..., None]
    fy = fy[..., None]
    out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
           + fy * ((1 - fx) * v10 + fx * v11))
    return out.astype(x.dtype)
