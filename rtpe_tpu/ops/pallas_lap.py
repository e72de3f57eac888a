"""Pallas TPU kernel for the decode grouping's rectangular LAP.

The associative-embedding grouping solves one ≤30x60 linear assignment
per joint, 17 joints sequentially (``decode/group_jit.py``).  As XLA
ops, each successive-shortest-path iteration is ~12 small vector ops
with ~1 us/op scheduling overhead — measured 4.8 ms per solve, 82 ms
per image, the entire latency floor of the fused device decode.  This
kernel runs the SAME algorithm as one Mosaic program: the state lives
in vector registers/VMEM, loop iterations compile to straight-line
VLIW, and the per-iteration cost drops by an order of magnitude.

Algorithmic identity with ``hungarian_jit.hungarian_rect``: the
potentials formulation with one twist that removes all scatters —
row potentials are tracked COLUMN-indexed (``u_col[j] = u[p[j]]``):

* reads ``u[i0]`` with ``i0 = p[j0]`` become lane reads ``u_col[j0]``;
* the per-iteration update ``u[p[used]] += delta`` becomes the masked
  vector add ``u_col[used] += delta``;
* the augmenting walk moves ``u_col`` alongside ``p`` (the potential
  follows its row).

Dynamic single-lane reads/writes are expressed as masked reductions /
selects over a lane iota — no gather/scatter, which Mosaic lacks.

Scope contract (cf. the solvers it replaces): optimal total cost;
tie-breaking may differ from munkres (same caveat as ``hungarian_rect``
— the host ``group.py`` path remains the bit-exact parity oracle).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INF = 1e18  # plain float: a jnp constant would be captured as a
#              tracer by the kernel closure, which pallas_call rejects
_LANES = 128
_ROWS = 32


def _lap_kernel(cost_ref, p_ref, *, n: int, m: int):
    """One rectangular LAP.  cost_ref: (32, 128) f32 where lane ``j``
    (1..m) holds column ``j-1`` of the cost matrix, row ``r`` (0..n-1)
    holds detection row ``r``.  p_ref out: (1, 128) i32 — ``p[j]`` =
    1-indexed row assigned to column ``j`` (0 = unmatched)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    valid_col = (lane >= 1) & (lane <= m)

    v0 = jnp.zeros((1, _LANES), jnp.float32)
    u0 = jnp.zeros((1, _LANES), jnp.float32)
    p0 = jnp.zeros((1, _LANES), jnp.int32)

    def read_lane_i(vec, j):
        return jnp.sum(jnp.where(lane == j, vec, 0))

    def read_lane_f(vec, j):
        return jnp.sum(jnp.where(lane == j, vec, 0.0))

    def add_row(i, carry):
        v, u_col, p = carry
        # column 0 hosts the entering row i (its potential starts at 0)
        p = jnp.where(lane == 0, i, p)
        u_col = jnp.where(lane == 0, 0.0, u_col)
        minv = jnp.full((1, _LANES), _INF)
        way = jnp.zeros((1, _LANES), jnp.int32)
        # used as an i32 mask: Mosaic while-loop carries reject i1
        # vectors ("failed to legalize scf.yield")
        used = jnp.zeros((1, _LANES), jnp.int32)

        def cond(c):
            v, u_col, p, minv, way, used, j0 = c
            return read_lane_i(p, j0) != 0

        def body(c):
            v, u_col, p, minv, way, used, j0 = c
            used = jnp.where(lane == j0, 1, used)
            used_b = used > 0
            i0 = read_lane_i(p, j0)
            ui0 = read_lane_f(u_col, j0)
            # dynamic sublane read of cost row i0-1 (cheaper than a
            # (32,128) masked reduction per iteration)
            crow = cost_ref[pl.ds(i0 - 1, 1), :]
            cur = jnp.where(valid_col & (~used_b), crow - ui0 - v,
                            _INF)
            better = cur < minv
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used_b | (~valid_col), _INF, minv)
            delta = jnp.min(masked)
            # smallest lane attaining the min (= deterministic argmin)
            j1 = jnp.min(jnp.where(masked == delta, lane, _LANES))
            u_col = jnp.where(used_b, u_col + delta, u_col)
            v = jnp.where(used_b, v - delta, v)
            minv = jnp.where(used_b, minv, minv - delta)
            return v, u_col, p, minv, way, used, j1

        v, u_col, p, minv, way, used, j0 = jax.lax.while_loop(
            cond, body, (v, u_col, p, minv, way, used, jnp.int32(0)))

        # augmenting walk: j0 -> way[j0] -> ... -> 0, moving (row,
        # potential) pairs one column forward
        def aug_cond(c):
            p, u_col, j0 = c
            return j0 != 0

        def aug_body(c):
            p, u_col, j0 = c
            j1 = read_lane_i(way, j0)
            pj1 = read_lane_i(p, j1)
            uj1 = read_lane_f(u_col, j1)
            p = jnp.where(lane == j0, pj1, p)
            u_col = jnp.where(lane == j0, uj1, u_col)
            return p, u_col, j1

        p, u_col, _ = jax.lax.while_loop(aug_cond, aug_body,
                                         (p, u_col, j0))
        return v, u_col, p

    _, _, p = jax.lax.fori_loop(1, n + 1, add_row, (v0, u0, p0))
    p_ref[:] = jnp.where(lane == 0, 0, p)


@partial(jax.jit, static_argnames=("interpret",))
def hungarian_rect_pallas(cost: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Drop-in for :func:`~rtpe_tpu.decode.hungarian_jit.hungarian_rect`
    backed by the Mosaic kernel.

    :param cost: (n, m) float cost matrix, ``n <= 32``, ``m <= 127``.
    :returns: (n,) int32 — column assigned to each row.
    """
    n, m = cost.shape
    assert n <= _ROWS and m <= _LANES - 1, (n, m)
    padded = jnp.full((_ROWS, _LANES), _INF, jnp.float32)
    padded = padded.at[:n, 1:m + 1].set(cost.astype(jnp.float32))
    p = pl.pallas_call(
        partial(_lap_kernel, n=n, m=m),
        out_shape=jax.ShapeDtypeStruct((1, _LANES), jnp.int32),
        interpret=interpret,
    )(padded)
    rows = p[0, 1:m + 1] - 1
    col_of_row = jnp.zeros((n,), jnp.int32).at[
        jnp.where(rows >= 0, rows, n)].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    return col_of_row
