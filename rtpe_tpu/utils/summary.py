"""Model summaries from Flax variable trees.

Replaces the reference's hook-based summarizers (``ModuleSummary``,
``rtpe/helpers.py:76-180``; ``get_model_summary``,
``rtpe/third_party/utils.py:112-227``).  FLOPs come from XLA's own cost
analysis instead of per-layer hooks — the compiler's number includes
fusion and is what the hardware will actually run.
"""

from typing import Dict, Optional

import numpy as np

from flax.traverse_util import flatten_dict


def param_count(params: Dict) -> int:
    return int(sum(np.prod(np.shape(p))
                   for p in flatten_dict(params).values()))


def model_summary(variables: Dict, as_string: bool = True,
                  col_sep: int = 46):
    """Per-parameter table + totals, like the reference summary."""
    rows = []
    total = 0
    for path, p in sorted(flatten_dict(variables).items()):
        n = int(np.prod(np.shape(p)))
        total += n
        rows.append(("/".join(path), n, tuple(np.shape(p))))
    if not as_string:
        return rows, {"TOTAL PARAMS": total}
    fmt = "{:<%d}{:<14}{}" % col_sep
    lines = [fmt.format("Parameter", "Num. params.", "Shape")]
    lines.append("=" * (col_sep + 30))
    for name, n, shape in rows:
        lines.append(fmt.format(name[:col_sep - 1], n, shape))
    lines.append("=" * (col_sep + 30))
    lines.append(f"TOTAL PARAMS: {total}")
    return "\n".join(lines)


def compiled_flops(jitted_fn, *args) -> Optional[float]:
    """FLOPs of the compiled function (one shared implementation in
    obs/profiling.py)."""
    from ..obs.profiling import flops_of
    return flops_of(jitted_fn, *args)
