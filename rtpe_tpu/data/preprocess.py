"""Inference preprocessing: 64-multiple resize-align and its inverse.

Reproduces the coordinate math of ``rtpe/third_party/transforms.py``:

* :func:`get_multi_scale_size` (:155-176) — target size rounded up to a
  64 multiple, with the center/scale(×200) bookkeeping
* :func:`resize_align_multi_scale` (:179-192) — the warp itself, done
  with the batched device sampler instead of cv2
* :func:`transform_preds` (:50-56) — map decoded keypoints back to
  original image coordinates

IMG_MEAN/IMG_STD are the ImageNet constants the reference normalizes
with (``teacher_inference.py:70-73``, ``distillation.py:65-66``).
"""

from typing import Tuple

import numpy as np

from ..ops.affine import affine_warp, get_affine_transform

IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)


def get_multi_scale_size(image_hw: Tuple[int, int], input_size: int,
                         current_scale: float, min_scale: float):
    """:returns: ((w_resized, h_resized), center, scale) — identical
    numbers to the reference implementation."""
    h, w = image_hw
    center = np.array([int(w / 2.0 + 0.5), int(h / 2.0 + 0.5)])

    min_input_size = int((min_scale * input_size + 63) // 64 * 64)
    if w < h:
        w_resized = int(min_input_size * current_scale / min_scale)
        h_resized = int(
            int((min_input_size / w * h + 63) // 64 * 64)
            * current_scale / min_scale)
        scale_w = w / 200.0
        scale_h = h_resized / w_resized * w / 200.0
    else:
        h_resized = int(min_input_size * current_scale / min_scale)
        w_resized = int(
            int((min_input_size / h * w + 63) // 64 * 64)
            * current_scale / min_scale)
        scale_h = h / 200.0
        scale_w = w_resized / h_resized * h / 200.0

    return (w_resized, h_resized), center, np.array([scale_w, scale_h])


def resize_align_multi_scale(image_hwc: np.ndarray, input_size: int = 640,
                             current_scale: float = 1.0,
                             min_scale: float = 1.0):
    """:returns: (resized image (h', w', C) float32, center, scale)."""
    import jax.numpy as jnp
    size_resized, center, scale = get_multi_scale_size(
        image_hwc.shape[:2], input_size, current_scale, min_scale)
    trans = get_affine_transform(center, scale, 0, size_resized)
    out = affine_warp(jnp.asarray(image_hwc[None], jnp.float32),
                      jnp.asarray(trans[None]),
                      (size_resized[1], size_resized[0]))
    return np.asarray(out[0]), center, scale


def normalize_image(img_hwc: np.ndarray) -> np.ndarray:
    """[0,1] RGB -> ImageNet-normalized float32."""
    return ((np.asarray(img_hwc, np.float32) - IMG_MEAN) / IMG_STD)


def transform_preds(coords: np.ndarray, center, scale,
                    output_size) -> np.ndarray:
    """Map (N, >=2) heatmap-space coords back to original-image space."""
    target = coords.copy()
    trans = get_affine_transform(center, scale, 0, output_size, inv=True)
    for p in range(coords.shape[0]):
        xy1 = np.array([coords[p, 0], coords[p, 1], 1.0])
        target[p, 0:2] = (trans @ xy1)[:2]
    return target


def get_final_preds(grouped_joints, center, scale, heatmap_size):
    """Per-person inverse transform (reference ``transforms.py:195-202``)."""
    return [transform_preds(person, center, scale, heatmap_size)
            for person in grouped_joints[0]]
