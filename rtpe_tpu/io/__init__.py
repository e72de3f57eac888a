"""Model I/O: torch-statedict import and orbax checkpointing."""

from .torch_import import (  # noqa: F401
    import_teacher_statedict,
    import_stem_statedict,
    load_torch_statedict,
    strip_fp16_prefix,
)
