"""Bottom-up heatmap decoding: NMS, top-k, AE grouping, adjust, refine.

Replaces the reference's CPU decode stack
(``rtpe/third_party/group.py``) with a split design:

* device side (jit/Pallas): max-pool NMS + per-joint top-k over the
  whole batch in one fused pass (``nms.py``)
* host side (numpy): order-dependent associative-embedding grouping,
  quarter-pixel adjust and tag-guided refine (``group.py``) — kept
  bit-compatible with the reference for AP parity
* :class:`HeatmapParser` ties both together with the same constructor
  surface as the reference class (``group.py:125``).
"""

from .nms import nms_heatmaps, top_k  # noqa: F401
from .group import match_by_tag, munkres_assign  # noqa: F401
from .group_jit import match_by_tag_jit  # noqa: F401
from .hungarian_jit import hungarian  # noqa: F401
from .fused import decode_full  # noqa: F401
from .parser import HeatmapParser  # noqa: F401
