"""Core numeric ops with reference-exact semantics.

The reference relies on torch/cv2 ops whose coordinate conventions differ
from the jax.image defaults, so every resampling op is implemented here
explicitly (mostly as separable matmuls, which map straight onto the MXU).
"""

from .resize import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
    upsample_nearest,
)
from .pooling import (  # noqa: F401
    avg_pool,
    max_pool,
    global_avg_pool,
)
from .color import rgb_to_lab, rgb_to_hsv  # noqa: F401
from .affine import (  # noqa: F401
    get_affine_transform,
    affine_warp,
    solve_affine,
)
