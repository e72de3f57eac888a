"""Precomputed teacher-prediction cache (.npz per image).

File contract identical to the reference corpus
(``teacher_inference.py:67-90``, consumed at ``dataloaders.py:140-165``):
``{OUT_DIR}/{imgname}.jpg_w48_predictions.npz`` with keys
``pred_heatmaps`` (17, h, w), ``embeddings`` (tag dims, h, w),
``heatmaps_refined`` (17, 2h, 2w), ``heatmaps_order`` (joint names).
Arrays on disk stay CHW for byte-compatibility with the reference
corpus; loaders return NHWC-friendly HWC.
"""

import os
from typing import Tuple

import numpy as np

from .coco import COCO_JOINT_NAMES as HEATMAPS_ORDER  # single source:
# the 17-name joint order is the byte contract of the teacher npz corpus


def prediction_path(out_dir: str, image_basename: str) -> str:
    return os.path.join(out_dir, image_basename + "_w48_predictions.npz")


def save_teacher_prediction(out_dir: str, image_basename: str,
                            coarse_hwc: np.ndarray,
                            refined_hwc: np.ndarray,
                            num_joints: int = 17) -> str:
    """Save one image's teacher outputs (NHWC inputs, CHW on disk)."""
    path = prediction_path(out_dir, image_basename)
    coarse = np.transpose(np.asarray(coarse_hwc, np.float32), (2, 0, 1))
    refined = np.transpose(np.asarray(refined_hwc, np.float32), (2, 0, 1))
    np.savez_compressed(path,
                        pred_heatmaps=coarse[:num_joints],
                        embeddings=coarse[num_joints:],
                        heatmaps_refined=refined,
                        heatmaps_order=HEATMAPS_ORDER)
    return path


def load_teacher_prediction(teacher_dir: str, img_num: str,
                            ) -> Tuple[np.ndarray, np.ndarray]:
    """Load ``(heatmaps_refined, embeddings)`` as HWC float32 — the two
    arrays the distillation dataset consumes (``dataloaders.py:149-154``).

    :param img_num: zero-padded 12-digit image id string.
    """
    npz = np.load(prediction_path(teacher_dir, img_num + ".jpg"))
    t_hms = np.transpose(npz["heatmaps_refined"], (1, 2, 0))
    t_ae = np.transpose(npz["embeddings"], (1, 2, 0))
    return t_hms.astype(np.float32), t_ae.astype(np.float32)
