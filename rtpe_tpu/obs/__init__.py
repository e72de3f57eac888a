"""Observability: visualization, TensorBoard writers, profiling helpers."""

from .vis import (  # noqa: F401
    COCO_SKELETON,
    add_joints,
    heatmaps_grid,
    save_valid_image,
)
from .tb import MetricWriter  # noqa: F401
