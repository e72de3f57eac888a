"""Model I/O: torch-statedict import, orbax checkpointing, and the
deployable serving artifact (weights + calibration + config in one
directory, ``serving.py``)."""

from .serving import (  # noqa: F401
    ServingArtifact,
    export_serving_artifact,
    load_serving_artifact,
)
from .torch_import import (  # noqa: F401
    import_teacher_statedict,
    import_stem_statedict,
    load_torch_statedict,
    strip_fp16_prefix,
)
