"""Pallas TPU mega-kernel: the ENTIRE associative-embedding grouping.

``decode/group_jit.py`` runs the grouping as a scan over joints where
each joint does (a) a cost-matrix build, (b) a rectangular LAP, and
(c) a 30-iteration per-row people-table update loop.  Steps (a) and
(c) compile to ~540 small XLA ops per joint; measured truthfully
(chain-differenced past the tunnel constant) the XLA tail costs ~8 ms
per image — 6x the LAP kernels themselves.

This kernel runs ALL of it as ONE ``pallas_call`` with ``grid=(B, J)``:
per grid step the cost matrix is built in registers from the carried
tag statistics, the LAP (same successive-shortest-path core as
``ops/pallas_lap.py``) runs against a VMEM scratch, and the per-row
update loop is STATICALLY UNROLLED straight-line vector code.  Person
state (keys / tag sums / counts / count) is carried across the J grid
steps in constant-index output blocks; the per-joint people rows are
written to a per-(b, j) output block.  One kernel launch decodes a
whole batch.

Semantics are bit-identical to ``match_by_tag_jit`` (itself validated
against the host oracle ``decode/group.py``, the reference
transliteration): same fp32 sentinel design (cost clamp 1000 /
BIG 2048 / HUGE 4096, ``group_jit.py:36-43``), same tie bias, same
float-key merge ("setdefault") semantics including the p_max cap
devolution, same last-writer-wins row ordering.  Reference behavior:
``/root/reference/rtpe/third_party/group.py:26-97``.

Tie-breaking note: the LAP core picks the smallest-lane argmin — the
same deterministic rule as ``hungarian_rect_pallas``; equality with
the XLA path on non-degenerate scenes is asserted in
``tests/test_decode.py``.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e18
_LANES = 128
_ROWS = 32   # detection rows padded to one sublane tile
_PSLOTS = 96  # people sublane pad (p_max <= 96)

COST_CLAMP = 1000.0
BIG = 2048.0
HUGE = 4096.0


def _lap_on_scratch(cost_ref, lane, n, m: int):
    """The successive-shortest-path LAP of ``ops/pallas_lap.py``,
    reading cost rows from a VMEM scratch ref.  ``n`` may be a traced
    row count (the row loop then lowers to a dynamic-trip while loop).
    Returns p (1, 128): ``p[l]`` = 1-indexed row assigned to cost
    column ``l - 1``.

    Arithmetic is identical to the original formulation; the only
    rewrites are latency ones: ``p[j0]`` / ``u[j0]`` are carried as
    scalars across Dijkstra iterations (they are read back at the
    freshly selected ``j1``, whose lane the in-iteration updates never
    touch), and the two lane-extracts share one stacked reduce — the
    cross-lane reductions per iteration drop from six to three.
    """
    valid_col = (lane >= 1) & (lane <= m)

    v0 = jnp.zeros((1, _LANES), jnp.float32)
    u0 = jnp.zeros((1, _LANES), jnp.float32)
    p0 = jnp.zeros((1, _LANES), jnp.int32)

    def read_lane_i(vec, j):
        return jnp.sum(jnp.where(lane == j, vec, 0))

    def read_lane2(u_col, p, j):
        """u_col[j] and p[j] in one stacked (2, 128) reduce; p values
        are row indices <= _ROWS, exact in f32."""
        both = jnp.concatenate([u_col, p.astype(jnp.float32)], axis=0)
        got = jnp.sum(jnp.where(lane == j, both, 0.0), axis=1)
        return got[0], got[1].astype(jnp.int32)

    def add_row(i, carry):
        v, u_col, p = carry
        p = jnp.where(lane == 0, i, p)
        u_col = jnp.where(lane == 0, 0.0, u_col)
        minv = jnp.full((1, _LANES), _INF)
        way = jnp.zeros((1, _LANES), jnp.int32)
        used = jnp.zeros((1, _LANES), jnp.int32)

        def cond(c):
            v, u_col, p, minv, way, used, j0, pj0, uj0 = c
            return pj0 != 0

        def body(c):
            v, u_col, p, minv, way, used, j0, pj0, uj0 = c
            used = jnp.where(lane == j0, 1, used)
            used_b = used > 0
            crow = cost_ref[pl.ds(pj0 - 1, 1), :]
            cur = jnp.where(valid_col & (~used_b), crow - uj0 - v,
                            _INF)
            better = cur < minv
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            masked = jnp.where(used_b | (~valid_col), _INF, minv)
            delta = jnp.min(masked)
            j1 = jnp.min(jnp.where(masked == delta, lane, _LANES))
            u_col = jnp.where(used_b, u_col + delta, u_col)
            v = jnp.where(used_b, v - delta, v)
            minv = jnp.where(used_b, minv, minv - delta)
            # j1 is not in `used`, so u_col[j1] was untouched above
            uj1, pj1 = read_lane2(u_col, p, j1)
            return v, u_col, p, minv, way, used, j1, pj1, uj1

        v, u_col, p, minv, way, used, j0, _, _ = jax.lax.while_loop(
            cond, body, (v, u_col, p, minv, way, used, jnp.int32(0),
                         i, jnp.float32(0.0)))

        def aug_cond(c):
            p, u_col, j0 = c
            return j0 != 0

        def aug_body(c):
            p, u_col, j0 = c
            j1 = read_lane_i(way, j0)
            uj1, pj1 = read_lane2(u_col, p, j1)
            p = jnp.where(lane == j0, pj1, p)
            u_col = jnp.where(lane == j0, uj1, u_col)
            return p, u_col, j1

        p, u_col, _ = jax.lax.while_loop(aug_cond, aug_body,
                                         (p, u_col, j0))
        return v, u_col, p

    _, _, p = jax.lax.fori_loop(1, n + 1, add_row, (v0, u0, p0))
    return jnp.where(lane == 0, 0, p)


def _group_step(tags, locs, vals,
                people_ref, keys_ref, tsum_ref, tcnt_ref, nppl_ref,
                cost_scr,
                *, k: int, m: int, d: int, p_max: int,
                detection_threshold: float, tag_threshold: float,
                use_detection_val: bool, ignore_too_much: bool,
                solver: str = "lap"):
    """One joint's grouping pass against the carried person state.

    ``tags`` (32, D), ``locs`` (32, 2), ``vals`` (32, 1) are this
    joint's top-k detections already in registers/VMEM values; the
    state refs carry keys / tag sums / counts / n_people across the
    joint grid steps.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    row2 = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 1), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)

    people_ref[0, 0, :, :] = jnp.zeros((_PSLOTS, _LANES), jnp.float32)

    keys = keys_ref[0]         # (1, 128)
    tcnt = tcnt_ref[0]         # (1, 128)
    npv = jnp.sum(jnp.where(lane == 0, nppl_ref[0], 0))  # scalar i32

    p_cur = jnp.minimum(npv, m)
    skip_all = jnp.bool_(ignore_too_much) & (p_cur == m)

    # ---- cost build (slot s state lane s; cost column c at lane c+1)
    det_valid = (vals > detection_threshold) & (row2 < k)  # (32, 1)
    cnt_safe = jnp.maximum(tcnt, 1.0)
    diff_sq = jnp.zeros((_ROWS, _LANES), jnp.float32)
    for dd in range(d):
        mean_d = tsum_ref[:, dd, :] / cnt_safe             # (1, 128)
        # slot s -> cost lane s+1 (lane 0 is the LAP entering slot)
        mean_sh = pltpu.roll(mean_d, 1, 1)
        dlt = tags[:, dd:dd + 1] - mean_sh                 # (32, 128)
        diff_sq = diff_sq + dlt * dlt
    diff_saved = jnp.sqrt(diff_sq)                         # (32, 128)
    if use_detection_val:
        diff_normed = jnp.round(diff_saved) * 100.0 - vals
    else:
        diff_normed = diff_saved
    diff_normed = jnp.minimum(diff_normed, COST_CLAMP)

    # cost column index c = lane - 1
    col_f = (lane2 - 1).astype(jnp.float32)
    rows_f = row2.astype(jnp.float32)
    tie_bias = (2 * m - rows_f) * col_f * jnp.float32(1e-8)
    col_real = (lane2 >= 1) & (lane2 <= p_cur)    # c < p_cur
    col_alive = (lane2 >= 1) & (lane2 <= 2 * m)   # c < 2m
    # real person columns carry the tag cost; dummy cols (m <= c < 2m)
    # carry 0 + bias under col_real (never true: p_cur <= m), BIG else
    padded = jnp.where(lane2 <= m, diff_normed, 0.0) + tie_bias
    block = jnp.where(col_real, padded, BIG)
    cost = jnp.where(det_valid, block,
                     jnp.where(col_real, HUGE, 0.0))
    cost = jnp.where(col_alive & (row2 < k), cost, _INF)
    cost_scr[:] = cost

    # Row-insert only up to the LAST above-threshold detection (with
    # val-sorted top-k input that is exactly the valid count).  The
    # reference masks sub-threshold detections out of munkres entirely
    # (group.py:41-43); the trailing rows skipped here could only ever
    # rewire dummy columns among themselves (their real-person entries
    # sit >= HUGE - accumulated duals above any 0-reduced-cost free
    # dummy, in f32 too), so the real matching is unchanged.  When no
    # people exist yet (or ignore_too_much saturates), the assignment
    # is irrelevant — every active row becomes a new person — and the
    # LAP is skipped outright.
    active = det_valid & (~skip_all)
    if solver == "lap":
        n_valid = jnp.max(jnp.where(det_valid, row2 + 1, 0))
        n_rows = jnp.where((p_cur == 0) | skip_all, 0, n_valid)
        p = _lap_on_scratch(cost_scr, lane, n=n_rows, m=2 * m)

        # col of each detection row (rows 0..k-1 all assigned: k <= m)
        rowmatch = (p == row2 + 1) & (lane2 >= 1) & (lane2 <= 2 * m)
        col_of_row = jnp.sum(jnp.where(rowmatch, lane2 - 1, 0), axis=1,
                             keepdims=True)                 # (32, 1)
        # diff_saved at the assigned (clipped) person column
        tgt_lane = jnp.clip(col_of_row, 0, m - 1) + 1
        diff_at = jnp.sum(jnp.where(lane2 == tgt_lane, diff_saved, 0.0),
                          axis=1, keepdims=True)            # (32, 1)

        matched_v = (active & (col_of_row < p_cur) &
                     (diff_at < tag_threshold)).astype(jnp.int32)
        is_new_v = active.astype(jnp.int32) * (1 - matched_v)
    else:
        # GREEDY assignment (solver="greedy"): rows arrive val-sorted
        # from top-k; each takes the lowest-cost UNUSED person column
        # (same rounded-cost + tie-bias ordering as the LAP within a
        # row), accepted under the same unrounded diff < tag_threshold
        # rule; a rejected column stays available.  All straight-line
        # vector ops — no Dijkstra while-loops, whose ~1 us/iteration
        # sequential depth is the single-image latency floor of the
        # LAP path (VERDICT r3 item 3).  Optimal-vs-greedy divergence
        # is possible on contended scenes; people/AP-level agreement
        # is asserted in tests/test_decode.py on the minival-style
        # fixtures, and the batch path keeps the exact LAP.
        used = jnp.zeros((1, _LANES), jnp.bool_)
        # Mosaic cannot extract a BOOL scalar from a vector ("only
        # arrays with 32-bit element types can be converted to
        # scalars") — read the int32 view and compare instead
        active_i = active.astype(jnp.int32)                 # (32, 1)
        col_list, match_list = [], []
        for r in range(k):
            crow = cost[r:r + 1]                            # (1, 128)
            cand = (lane >= 1) & (lane <= p_cur) & (~used)
            masked = jnp.where(cand, crow, _INF)
            cmin = jnp.min(masked)
            l_at = jnp.min(jnp.where(masked == cmin, lane, _LANES))
            d_at = jnp.sum(jnp.where(lane == l_at,
                                     diff_saved[r:r + 1], 0.0))
            m_r = ((active_i[r, 0] != 0) & (cmin < BIG)
                   & (d_at < tag_threshold))
            used = used | (m_r & (lane == l_at))
            col_list.append(jnp.where(m_r, l_at - 1, 2 * m))
            match_list.append(m_r)
        col_of_row = jnp.stack(
            [c.astype(jnp.int32) for c in col_list])[:, None]
        matched_v = jnp.stack(
            [mm.astype(jnp.int32) for mm in match_list])[:, None]
        col_of_row = jnp.pad(col_of_row, ((0, _ROWS - k), (0, 0)))
        matched_v = jnp.pad(matched_v, ((0, _ROWS - k), (0, 0)))
        is_new_v = active.astype(jnp.int32) * (1 - matched_v)

    tsum = [tsum_ref[:, dd, :] for dd in range(d)]
    slot_l = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    # ---- per-row update loop, statically unrolled (k rows)
    for r in range(k):
        matched_r = matched_v[r, 0] != 0
        is_new_r = is_new_v[r, 0] != 0
        col_r = col_of_row[r, 0]
        key_r = tags[r, 0]

        # det row vector: lanes [x, y, val, tag_0..tag_{D-1}]
        rowvec = jnp.where(lane == 0, locs[r, 0],
                           jnp.where(lane == 1, locs[r, 1],
                                     jnp.where(lane == 2, vals[r, 0],
                                               0.0)))
        for dd in range(d):
            rowvec = jnp.where(lane == 3 + dd, tags[r, dd], rowvec)

        # matched: slot = assigned column
        slot_m = jnp.clip(col_r, 0, p_max - 1)

        # new person: float-key merge (setdefault) semantics
        key_hit = (keys == key_r) & (slot_l < npv)
        has_hit = jnp.max(jnp.where(key_hit, 1, 0)) > 0
        hit_slot = jnp.min(jnp.where(key_hit, slot_l, _LANES))
        app_slot = jnp.minimum(npv, p_max - 1)
        slot_n = jnp.where(has_hit, hit_slot, app_slot)

        write_r = matched_r | is_new_r
        slot_r = jnp.where(matched_r, slot_m, slot_n)

        @pl.when(write_r)
        def _store(rowvec=rowvec, slot_r=slot_r):
            people_ref[0, 0, pl.ds(slot_r, 1), :] = rowvec

        sel_m = matched_r & (slot_l == slot_m)
        sel_n = is_new_r & (slot_l == slot_n)
        for dd in range(d):
            tsum[dd] = jnp.where(sel_m, tsum[dd] + tags[r, dd],
                                 jnp.where(sel_n, tags[r, dd],
                                           tsum[dd]))
        tcnt = jnp.where(sel_m, tcnt + 1.0,
                         jnp.where(sel_n, 1.0, tcnt))
        alloc = is_new_r & (~has_hit)
        keys = jnp.where(alloc & (slot_l == slot_n), key_r, keys)
        npv = jnp.where(alloc, jnp.minimum(npv + 1, p_max), npv)

    keys_ref[0] = keys
    tcnt_ref[0] = tcnt
    for dd in range(d):
        tsum_ref[:, dd, :] = tsum[dd]
    nppl_ref[0] = jnp.where(lane == 0, npv, 0)


def _group_kernel(tag_ref, loc_ref, val_ref,
                  people_ref, keys_ref, tsum_ref, tcnt_ref, nppl_ref,
                  cost_scr,
                  *, k: int, m: int, d: int, p_max: int,
                  detection_threshold: float, tag_threshold: float,
                  use_detection_val: bool, ignore_too_much: bool,
                  solver: str = "lap"):
    j_step = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    @pl.when(j_step == 0)
    def _init():
        keys_ref[:] = jnp.full((1, 1, _LANES), jnp.inf, jnp.float32)
        tsum_ref[:] = jnp.zeros((1, d, _LANES), jnp.float32)
        tcnt_ref[:] = jnp.zeros((1, 1, _LANES), jnp.float32)
        nppl_ref[:] = jnp.zeros((1, 1, _LANES), jnp.int32)

    _group_step(tag_ref[0, 0], loc_ref[0, 0], val_ref[0, 0],
                people_ref, keys_ref, tsum_ref, tcnt_ref, nppl_ref,
                cost_scr, k=k, m=m, d=d, p_max=p_max,
                detection_threshold=detection_threshold,
                tag_threshold=tag_threshold,
                use_detection_val=use_detection_val,
                ignore_too_much=ignore_too_much, solver=solver)


@partial(jax.jit, static_argnames=(
    "max_num_people", "detection_threshold", "tag_threshold",
    "use_detection_val", "ignore_too_much", "p_max", "interpret",
    "solver"))
def match_by_tag_kernel(tag_k: jax.Array, loc_k: jax.Array,
                        val_k: jax.Array,
                        max_num_people: int = 30,
                        detection_threshold: float = 0.1,
                        tag_threshold: float = 1.0,
                        use_detection_val: bool = True,
                        ignore_too_much: bool = False,
                        p_max: int = 90,
                        interpret: bool = False,
                        solver: str = "lap"
                        ) -> Tuple[jax.Array, jax.Array]:
    """Batched grouping as one kernel launch.

    :param tag_k: (B, J, K, D); :param loc_k: (B, J, K, 2);
    :param val_k: (B, J, K).
    :param solver: ``"lap"`` (exact, munkres-equal) or ``"greedy"``
      (val-ordered nearest-unused-person; no sequential Dijkstra
      depth — the single-image latency path, see ``_group_step``).
    :returns: (people (B, p_max, J, 3+D) f32, n_people (B,) i32).
    """
    b, j, k, d = tag_k.shape
    m = max_num_people
    assert k <= _ROWS and 2 * m + 1 <= _LANES and p_max <= _PSLOTS
    assert k <= m

    f32 = jnp.float32
    pad_rows = _ROWS - k
    tag_p = jnp.pad(tag_k.astype(f32),
                    ((0, 0), (0, 0), (0, pad_rows), (0, 0)))
    loc_p = jnp.pad(loc_k.astype(f32),
                    ((0, 0), (0, 0), (0, pad_rows), (0, 0)))
    # padded rows get val = -1: strictly below any detection threshold
    val_p = jnp.pad(val_k.astype(f32)[..., None],
                    ((0, 0), (0, 0), (0, pad_rows), (0, 0)),
                    constant_values=-1.0)

    kern = partial(_group_kernel, k=k, m=m, d=d, p_max=p_max,
                   detection_threshold=detection_threshold,
                   tag_threshold=tag_threshold,
                   use_detection_val=use_detection_val,
                   ignore_too_much=ignore_too_much, solver=solver)

    people, _, _, _, nppl = pl.pallas_call(
        kern,
        grid=(b, j),
        in_specs=[
            pl.BlockSpec((1, 1, _ROWS, d), lambda bb, jj: (bb, jj, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _ROWS, 2), lambda bb, jj: (bb, jj, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _ROWS, 1), lambda bb, jj: (bb, jj, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, _PSLOTS, _LANES),
                         lambda bb, jj: (bb, jj, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANES), lambda bb, jj: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, _LANES), lambda bb, jj: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANES), lambda bb, jj: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _LANES), lambda bb, jj: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, j, _PSLOTS, _LANES), f32),
            jax.ShapeDtypeStruct((b, 1, _LANES), f32),
            jax.ShapeDtypeStruct((b, d, _LANES), f32),
            jax.ShapeDtypeStruct((b, 1, _LANES), f32),
            jax.ShapeDtypeStruct((b, 1, _LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((_ROWS, _LANES), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(tag_p, loc_p, val_p)

    people = people[:, :, :p_max, :3 + d]          # (B, J, P, 3+D)
    people = jnp.transpose(people, (0, 2, 1, 3))   # (B, P, J, 3+D)
    return people, nppl[:, 0, 0]
