"""Jit-compatible Hungarian algorithm (square LAP, minimization).

The successive-shortest-path / potentials formulation, expressed with
``lax.while_loop`` so it compiles into the decode program (SURVEY.md
§7 hard part #6: "Hungarian under jit").  For the decode's 60×60
matrices the whole solve is a few hundred vector ops.

Returns, like the C++ solver in ``native/lap.cpp``, the column assigned
to every row of an optimal assignment.  On cost ties an arbitrary
optimal assignment is returned (matching total cost, possibly different
pairs than munkres — same caveat as any LAP backend swap).
"""

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e18)


@partial(jax.jit, static_argnames=())
def hungarian_rect(cost: jax.Array) -> jax.Array:
    """Rectangular LAP: assign each ROW a distinct column, minimizing
    total cost; columns may stay unmatched.

    :param cost: (n, m) float cost matrix with ``n <= m``.
    :returns: (n,) int32 — column assigned to each row.

    For the decode grouping this is the load-bearing speedup over the
    square form: the 30 dummy detection rows that squared the 60x60
    matrix only existed to absorb unmatched columns, which the
    successive-shortest-path formulation handles natively — half the
    row insertions and shorter augmenting paths (measured ~2x on the
    fused device decode).
    """
    n, m = cost.shape
    assert n <= m, (n, m)
    cost = cost.astype(jnp.float32)
    cols = jnp.arange(m + 1, dtype=jnp.int32)

    def add_row(i, state):
        """Grow the matching by one row (1-indexed row i)."""
        u, v, p = state
        p = p.at[0].set(i)
        minv = jnp.full((m + 1,), _INF)
        way = jnp.zeros((m + 1,), jnp.int32)
        used = jnp.zeros((m + 1,), jnp.bool_)
        j0 = jnp.int32(0)

        def cond(carry):
            u, v, p, minv, way, used, j0 = carry
            return p[j0] != 0

        def body(carry):
            u, v, p, minv, way, used, j0 = carry
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = (cost[i0 - 1, jnp.clip(cols - 1, 0, m - 1)]
                   - u[i0] - v)
            cur = jnp.where((cols >= 1) & (~used), cur, _INF)
            better = cur < minv
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)

            masked = jnp.where(used, _INF, minv).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # adjust potentials
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, way, used, j1

        u, v, p, minv, way, used, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, way, used, j0))

        # augmenting path: walk `way` back to column 0
        def aug_cond(carry):
            p, j0 = carry
            return j0 != 0

        def aug_body(carry):
            p, j0 = carry
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    u = jnp.zeros((n + 1,), jnp.float32)
    v = jnp.zeros((m + 1,), jnp.float32)
    p = jnp.zeros((m + 1,), jnp.int32)
    u, v, p = jax.lax.fori_loop(1, n + 1, add_row, (u, v, p))

    # p[j] (1..n) is the row matched to column j; invert to row -> col.
    # Unmatched columns carry p[j] = 0 -> row index -1: dropped.
    rows = p[1:] - 1
    col_of_row = jnp.zeros((n,), jnp.int32).at[
        jnp.where(rows >= 0, rows, n)].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    return col_of_row


@partial(jax.jit, static_argnames=())
def hungarian(cost: jax.Array) -> jax.Array:
    """:param cost: (n, n) float cost matrix.
    :returns: (n,) int32 — column assigned to each row."""
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    cols = jnp.arange(n + 1, dtype=jnp.int32)

    def add_row(i, state):
        """Grow the matching by one row (1-indexed row i)."""
        u, v, p = state
        p = p.at[0].set(i)
        minv = jnp.full((n + 1,), _INF)
        way = jnp.zeros((n + 1,), jnp.int32)
        used = jnp.zeros((n + 1,), jnp.bool_)
        j0 = jnp.int32(0)

        def cond(carry):
            u, v, p, minv, way, used, j0 = carry
            return p[j0] != 0

        def body(carry):
            u, v, p, minv, way, used, j0 = carry
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = (cost[i0 - 1, jnp.clip(cols - 1, 0, n - 1)]
                   - u[i0] - v)
            cur = jnp.where((cols >= 1) & (~used), cur, _INF)
            better = cur < minv
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)

            masked = jnp.where(used, _INF, minv).at[0].set(_INF)
            j1 = jnp.argmin(masked).astype(jnp.int32)
            delta = masked[j1]
            # adjust potentials
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            return u, v, p, minv, way, used, j1

        u, v, p, minv, way, used, j0 = jax.lax.while_loop(
            cond, body, (u, v, p, minv, way, used, j0))

        # augmenting path: walk `way` back to column 0
        def aug_cond(carry):
            p, j0 = carry
            return j0 != 0

        def aug_body(carry):
            p, j0 = carry
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p

    u = jnp.zeros((n + 1,), jnp.float32)
    v = jnp.zeros((n + 1,), jnp.float32)
    p = jnp.zeros((n + 1,), jnp.int32)
    u, v, p = jax.lax.fori_loop(1, n + 1, add_row, (u, v, p))

    # p[j] (1..n) is the row matched to column j; invert to row -> col
    col_of_row = jnp.zeros((n,), jnp.int32)
    col_of_row = col_of_row.at[p[1:] - 1].set(
        jnp.arange(n, dtype=jnp.int32))
    return col_of_row
