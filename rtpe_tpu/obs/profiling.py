"""Profiling & timing (SURVEY.md §5.1 — the reference has only ad-hoc
``time.time()`` calls and a hook-based FLOPs counter).

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-viewable trace.
* :func:`timeit` — block-until-ready timing harness with warmup; the
  correct way to time XLA dispatches.
* :func:`flops_of` — compiled-HLO cost analysis (includes fusion; what
  the hardware actually runs), replacing per-layer forward hooks.
"""

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace("/tmp/profile"): run_steps()`` then open TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, warmup: int = 2, iters: int = 10
           ) -> Dict[str, float]:
    """:returns: dict with p50/mean/min seconds per call."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {"p50": float(np.median(times)),
            "mean": float(times.mean()),
            "min": float(times.min())}


def flops_of(jitted_fn, *args) -> Optional[float]:
    """FLOPs of the compiled executable (XLA cost analysis)."""
    try:
        cost = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def memory_analysis(jitted_fn, *args) -> Optional[Dict[str, float]]:
    """Peak/argument/output memory of the compiled executable (bytes)."""
    try:
        mem = jitted_fn.lower(*args).compile().memory_analysis()
        return {
            "temp_bytes": float(getattr(mem, "temp_size_in_bytes", 0)),
            "argument_bytes": float(
                getattr(mem, "argument_size_in_bytes", 0)),
            "output_bytes": float(getattr(mem, "output_size_in_bytes", 0)),
            "generated_code_bytes": float(
                getattr(mem, "generated_code_size_in_bytes", 0)),
        }
    except Exception:
        return None
