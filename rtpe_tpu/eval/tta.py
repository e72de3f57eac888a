"""Test-time augmentation: flip test + multi-scale aggregation.

The reference's full-quality validation (the 0.698 AP pipeline) uses
flip-TTA and multi-scale aggregation via the external HigherHRNet repo
(``legacy/valid_ae1dim.py:166-191``, SURVEY.md §6).  TPU-native design:
the flipped image is batched with the original (one forward of batch 2
instead of two sequential passes), heatmaps are averaged after
``flip_back``, and flip tags are *stacked* along the tag dimension as in
HigherHRNet (so grouping sees D=2 tag vectors); scales run as separate
compiled shapes and aggregate by resize-average.
"""

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..data.coco import COCO_FLIP_PAIRS
from ..ops.resize import resize_bilinear


def flip_back(hms: jax.Array,
              flip_pairs: Sequence[Tuple[int, int]] = COCO_FLIP_PAIRS
              ) -> jax.Array:
    """Un-flip heatmaps of a horizontally flipped input: mirror W and
    swap left/right joint channels (reference ``transforms.py:16-30``;
    NHWC here)."""
    hms = hms[:, :, ::-1, :]
    j = hms.shape[-1]
    perm = list(range(j))
    for a, b in flip_pairs:
        if a < j and b < j:
            perm[a], perm[b] = perm[b], perm[a]
    return hms[..., jnp.asarray(perm)]


def flip_joints(joints: np.ndarray, width: float,
                flip_pairs: Sequence[Tuple[int, int]] = COCO_FLIP_PAIRS
                ) -> np.ndarray:
    """Mirror (P, J, >=3) keypoints horizontally with L/R channel swap
    (reference ``transforms.py:33-47``)."""
    joints = joints.copy()
    joints[..., 0] = width - joints[..., 0] - 1
    for a, b in flip_pairs:
        joints[:, [a, b]] = joints[:, [b, a]]
    return joints


def tta_forward(apply_fn: Callable, img: jax.Array,
                num_joints: int = 17,
                with_flip: bool = True,
                scales: Sequence[float] = (1.0,),
                base_hw: Optional[Tuple[int, int]] = None
                ) -> Tuple[jax.Array, jax.Array]:
    """Aggregate heatmaps/tags over flip and scales, batched.

    TPU-first shape (SURVEY §5.7): flip rides as a DOUBLED LEADING
    AXIS — one ``(2B, H, W, 3)`` dispatch per scale instead of 2B
    sequential forwards — and the whole image batch aggregates on
    device.  The per-image result is identical to running images one
    at a time (asserted in ``tests/test_extras.py``), because every
    aggregation step is per-image elementwise.

    :param apply_fn: ``f(batch_nhwc) -> (coarse, refined)`` with coarse
      carrying [heatmaps | tags] channels and refined carrying heatmaps
      (the teacher head contract).
    :param img: (B, H, W, 3) preprocessed inputs at scale 1.
    :returns: ``(heatmaps (B, H', W', J), tags (B, H', W', J*D))`` at
      ``base_hw`` (default: scale-1 refined resolution); D=2 with flip.
    """
    if 1.0 not in [float(s) for s in scales]:
        raise ValueError(
            f"scales {tuple(scales)} must include 1.0: tags are taken "
            f"from the primary scale only (HigherHRNet TTA contract)")
    b, h, w = img.shape[0:3]
    hm_acc = None
    tag_list: List[jax.Array] = []
    n_contrib = 0

    def to_base(t, base_hw):
        # same-shape bilinear resize is the identity (scale 1, taps at
        # integer positions) — skip it: at scale 1.0 both hms and tags
        # are already at base_hw, and the no-op gather costs real HBM
        # traffic on the (2B, H', W', J) f32 tensors
        if (int(t.shape[1]), int(t.shape[2])) == tuple(base_hw):
            return t
        return resize_bilinear(t, base_hw, align_corners=True)

    for scale in scales:
        if scale == 1.0:
            x = img
        else:
            sh = int(round(h * scale / 64)) * 64
            sw = int(round(w * scale / 64)) * 64
            x = resize_bilinear(img, (sh, sw), align_corners=False)
        batch = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0) \
            if with_flip else x
        coarse, refined = apply_fn(batch)
        hms = refined[..., :num_joints].astype(jnp.float32)
        tags = coarse[..., num_joints:].astype(jnp.float32)

        if base_hw is None:
            base_hw = (int(refined.shape[1]), int(refined.shape[2]))

        hms = to_base(hms, base_hw)
        if with_flip:
            hm = hms[:b] + flip_back(hms[b:])
            n_contrib += 2
        else:
            hm = hms[:b]
            n_contrib += 1
        hm_acc = hm if hm_acc is None else hm_acc + hm

        if scale == 1.0:  # tags only from the primary scale (HHRNet)
            tags_up = to_base(tags, base_hw)
            tag_list.append(tags_up[:b])
            if with_flip:
                tag_list.append(flip_back(tags_up[b:]))

    hm_avg = hm_acc / float(n_contrib)
    # stack flip tags along the tag dim: (B, H', W', J) x2 -> per-joint
    # D=2 vectors in the parser's (B, H, W, J*D) layout via interleave
    if len(tag_list) == 1:
        tags_out = tag_list[0]
    else:
        j = tag_list[0].shape[-1]
        stacked = jnp.stack(tag_list, axis=-1)  # (B, H', W', J, D)
        tags_out = stacked.reshape(*stacked.shape[:3], j * len(tag_list))
    return hm_avg, tags_out
