"""Device mesh + sharding rules (data parallel over ICI, DCN-ready)."""

from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .zero import zero1_state_sharding  # noqa: F401
