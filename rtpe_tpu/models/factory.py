"""Model factories (reference ``rtpe/helpers.py:32-73``)."""

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..io.torch_import import (
    import_stem_statedict,
    import_teacher_statedict,
    load_torch_statedict,
)
from .hrnet import PoseHigherHRNet, w48_config


def get_hrnet_w48_teacher(w48_statedict_path: str = None,
                          dtype: Any = jnp.bfloat16
                          ) -> Tuple[PoseHigherHRNet, dict]:
    """Build the W48 teacher and load the torch statedict.

    Equivalent of ``get_hrnet_w48_teacher`` (``rtpe/helpers.py:32-73``)
    but returning ``(model, variables)``; bf16 compute replaces the
    reference's fp16 ``network_to_half`` wrap (the importer strips its
    ``"1."`` key prefix).  With no path, returns random-initialized
    variables (useful for shape-only work and benchmarks).
    """
    model = PoseHigherHRNet(cfg=w48_config(), dtype=dtype)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False))()
    if w48_statedict_path is not None:
        sd = load_torch_statedict(w48_statedict_path)
        variables = import_teacher_statedict(variables, sd)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return model, variables


def get_packed_teacher(w48_statedict_path: str = None,
                       dtype: Any = jnp.bfloat16):
    """W48 teacher on the row-packed inference fast path.

    :returns: ``(forward, packed_params)`` where
        ``forward(packed_params, x)`` is jittable and returns the same
        ``(coarse, refined)`` as the canonical model's apply.
    """
    from .hrnet_packed import pack_w48_params, packed_forward

    cfg = w48_config()
    _, variables = get_hrnet_w48_teacher(w48_statedict_path,
                                         dtype=jnp.float32)
    pk = jax.jit(lambda v: pack_w48_params(v, cfg, dtype=dtype))(variables)

    def forward(packed_params, x):
        return packed_forward(packed_params, x, cfg, dtype=dtype)

    return forward, pk


def load_pretrained_stem(student_variables: dict,
                         w48_statedict_path: str) -> dict:
    """Load the teacher's stem weights into a student's ``stem``
    submodule (reference ``get_pretrained_stem``,
    ``rtpe/students.py:285-295``)."""
    sd = load_torch_statedict(w48_statedict_path)
    out = import_stem_statedict(student_variables, sd)
    return jax.tree_util.tree_map(jnp.asarray, out)
