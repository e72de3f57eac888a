"""Numerical-sanitation switches (SURVEY.md §5.2).

The reference's closest mechanism is fp16 overflow detection with
skip-step; on TPU the first line of defense is XLA's nan/inf checking
plus deterministic execution (default under XLA — the reference
explicitly traded determinism away with ``cudnn.deterministic=False``).
"""

import contextlib

import jax


def enable_nan_debugging(nans: bool = True, infs: bool = False) -> None:
    """Raise (with the offending jaxpr) the moment any jitted
    computation produces a NaN/Inf.  Costs a device sync per op —
    debugging only."""
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)


@contextlib.contextmanager
def nan_debugging(nans: bool = True, infs: bool = False):
    prev_n = jax.config.jax_debug_nans
    prev_i = jax.config.jax_debug_infs
    try:
        enable_nan_debugging(nans, infs)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_n)
        jax.config.update("jax_debug_infs", prev_i)


def assert_all_finite(tree, name: str = "tree") -> None:
    """Host-side finite check over a pytree (eval-loop guard)."""
    import numpy as np
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")
