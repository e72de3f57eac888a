"""Data layer: COCO reading, RLE, targets, augmentation, teacher cache."""

from .augment import AugmentConfig, sample_affine_matrices  # noqa: F401
from .coco import (  # noqa: F401
    COCO_FLIP_PAIRS,
    COCO_JOINT_NAMES,
    COCO_NUM_JOINTS,
    CocoAnnotations,
    get_human_segmentation_mask,
    get_ignore_mask,
    get_joints,
    read_whitelist,
)
from .dataset import CocoDistillationDataset  # noqa: F401
from .rle import (  # noqa: F401
    polygons_to_mask,
    rle_decode,
    rle_encode,
    segmentation_to_mask,
)
from .targets import HeatmapGenerator, render_heatmaps  # noqa: F401
from .teacher_cache import (  # noqa: F401
    load_teacher_prediction,
    save_teacher_prediction,
)
from .minival import make_rand_minival_split, write_minival_file  # noqa: F401
