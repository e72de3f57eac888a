"""Lockstep Pallas TPU grouping kernel: ``grid=(J,)``, batch on sublanes.

The grouping mega-kernel (:mod:`rtpe_tpu.ops.pallas_group`) runs
``grid=(B, J)`` — on a single TensorCore the B·J grid steps execute
sequentially, so a batch of 32 images pays 32× the per-joint
latency-bound vector-op chain.  This kernel runs ONE grid step per
joint with every image's state carried on the SUBLANE axis: all
per-joint work — cost build, greedy assignment, people/state update —
becomes (B, 128) masked vector ops, amortizing the sequential depth
across the whole batch (the round-3 lockstep redesign, now landable
because the GREEDY solver is straight-line code: the exact LAP's
carried-vector Dijkstra while-loops are what crashed Mosaic's LLO
lowering, see TODO.md round-3 notes).

The in-kernel people-table scatter (the other r3 blocker) is gone:
the kernel emits per-row SLOT DECISIONS — which people slot each
detection row writes, if any — and the (B, J, P, 3+D) people table is
reconstructed OUTSIDE the kernel by pure XLA gathers (last-writer-wins
via an arg-max over row index), preserving the reference's row
ordering semantics (``/root/reference/rtpe/third_party/group.py:26-97``
via the transliterated oracle ``decode/group.py``).

Semantics are identical to ``match_by_tag_kernel(solver="greedy")``:
same cost build (clamp 1000 / BIG 2048 / HUGE 4096), same rounded-cost
ordering and tie bias, same unrounded ``diff < tag_threshold``
acceptance, same float-key setdefault merge and p_max cap devolution.
Equality is asserted row-for-row in ``tests/test_decode.py``.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_group import (_LANES, _PSLOTS, _ROWS, BIG, COST_CLAMP,
                           HUGE)

_INF = 1e18
_NO_SLOT = 127  # slot sentinel: > _PSLOTS, never a real people slot


def _lockstep_kernel(tag_ref, loc_ref, val_ref,
                     slot_ref, keys_ref, tsum_ref, tcnt_ref, nppl_ref,
                     *, k: int, m: int, d: int, p_max: int,
                     detection_threshold: float, tag_threshold: float,
                     use_detection_val: bool, ignore_too_much: bool):
    """One joint for ALL images: every array is (B, ...) on sublanes."""
    j_step = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    @pl.when(j_step == 0)
    def _init():
        keys_ref[:] = jnp.full(keys_ref.shape, jnp.inf, jnp.float32)
        tsum_ref[:] = jnp.zeros(tsum_ref.shape, jnp.float32)
        tcnt_ref[:] = jnp.zeros(tcnt_ref.shape, jnp.float32)
        nppl_ref[:] = jnp.zeros(nppl_ref.shape, jnp.int32)

    tag_d = [tag_ref[0, dd] for dd in range(d)]   # each (B, _ROWS)
    locx = loc_ref[0, 0]                          # (B, _ROWS)
    locy = loc_ref[0, 1]
    vals = val_ref[0, 0]                          # (B, _ROWS)

    keys = keys_ref[0]                            # (B, _LANES)
    tcnt = tcnt_ref[0]
    tsum = [tsum_ref[dd] for dd in range(d)]
    npv = jnp.max(nppl_ref[0], axis=1, keepdims=True)  # (B, 1) i32

    p_cur = jnp.minimum(npv, m)                        # (B, 1)
    skip_all = jnp.bool_(ignore_too_much) & (p_cur == m)

    # person means frozen at joint entry; slot s -> cost lane s + 1
    cnt_safe = jnp.maximum(tcnt, 1.0)
    mean_sh = [pltpu.roll(tsum[dd] / cnt_safe, 1, 1) for dd in range(d)]

    # ---- loop 1: greedy decisions against the frozen state.  Rows
    # arrive val-sorted from top-k; each takes the lowest-cost UNUSED
    # person column (same rounded-cost + tie-bias ordering as the
    # grid=(B,J) greedy solver), accepted under unrounded
    # diff < tag_threshold; a rejected column stays available.
    used = jnp.zeros((vals.shape[0], _LANES), jnp.int32)
    col_list, match_list, active_list, diff_list = [], [], [], []
    for r in range(k):
        val_r = vals[:, r:r + 1]                       # (B, 1)
        active_r = (val_r > detection_threshold) & (~skip_all)
        diff_sq = jnp.zeros((vals.shape[0], _LANES), jnp.float32)
        for dd in range(d):
            dlt = tag_d[dd][:, r:r + 1] - mean_sh[dd]  # (B, 128)
            diff_sq = diff_sq + dlt * dlt
        diff_r = jnp.sqrt(diff_sq)                     # (B, 128)
        if use_detection_val:
            cost_r = jnp.round(diff_r) * 100.0 - val_r
        else:
            cost_r = diff_r
        cost_r = jnp.minimum(cost_r, COST_CLAMP)
        # same tie bias as the cost-matrix build (row r, col = lane-1)
        tie = ((2 * m - r) * 1e-8) * (lane - 1).astype(jnp.float32)
        crow = jnp.where(active_r, cost_r + tie, HUGE)  # (B, 128)
        cand = (lane >= 1) & (lane <= p_cur) & (used == 0)
        masked = jnp.where(cand, crow, _INF)
        cmin = jnp.min(masked, axis=1, keepdims=True)   # (B, 1)
        l_at = jnp.min(jnp.where(masked == cmin, lane, _LANES),
                       axis=1, keepdims=True)           # (B, 1)
        d_at = jnp.sum(jnp.where(lane == l_at, diff_r, 0.0),
                       axis=1, keepdims=True)           # (B, 1)
        m_r = active_r & (cmin < BIG) & (d_at < tag_threshold)
        used = jnp.where(m_r & (lane == l_at), 1, used)
        col_list.append(l_at - 1)
        match_list.append(m_r)
        active_list.append(active_r)
        diff_list.append(d_at)

    # ---- loop 2: state update with EVOLVING keys/npv (the reference
    # updates person state row by row after munkres returns)
    dec = jnp.full((vals.shape[0], _LANES), _NO_SLOT, jnp.int32)
    for r in range(k):
        matched_r = match_list[r]                      # (B, 1) bool
        is_new_r = active_list[r] & (~matched_r)
        col_r = col_list[r]
        key_r = tag_d[0][:, r:r + 1]                   # (B, 1)

        slot_m = jnp.clip(col_r, 0, p_max - 1)
        # new person: float-key merge (setdefault) semantics
        key_hit = (keys == key_r) & (lane < npv)
        has_hit = jnp.max(jnp.where(key_hit, 1, 0),
                          axis=1, keepdims=True) > 0   # (B, 1)
        hit_slot = jnp.min(jnp.where(key_hit, lane, _LANES),
                           axis=1, keepdims=True)
        app_slot = jnp.minimum(npv, p_max - 1)
        slot_n = jnp.where(has_hit, hit_slot, app_slot)

        write_r = matched_r | is_new_r                 # (B, 1)
        slot_r = jnp.where(matched_r, slot_m, slot_n)
        dec = jnp.where(write_r & (lane == r), slot_r, dec)

        sel_m = matched_r & (lane == slot_m)           # (B, 128)
        sel_n = is_new_r & (lane == slot_n)
        for dd in range(d):
            tag_rd = tag_d[dd][:, r:r + 1]
            tsum[dd] = jnp.where(sel_m, tsum[dd] + tag_rd,
                                 jnp.where(sel_n, tag_rd, tsum[dd]))
        tcnt = jnp.where(sel_m, tcnt + 1.0,
                         jnp.where(sel_n, 1.0, tcnt))
        alloc = is_new_r & (~has_hit)
        keys = jnp.where(alloc & (lane == slot_n), key_r, keys)
        npv = jnp.where(alloc, jnp.minimum(npv + 1, p_max), npv)

    slot_ref[0] = dec
    keys_ref[0] = keys
    tcnt_ref[0] = tcnt
    for dd in range(d):
        tsum_ref[dd] = tsum[dd]
    nppl_ref[0] = jnp.broadcast_to(npv, nppl_ref.shape[1:])


@partial(jax.jit, static_argnames=(
    "max_num_people", "detection_threshold", "tag_threshold",
    "use_detection_val", "ignore_too_much", "p_max", "interpret"))
def match_by_tag_lockstep(tag_k: jax.Array, loc_k: jax.Array,
                          val_k: jax.Array,
                          max_num_people: int = 30,
                          detection_threshold: float = 0.1,
                          tag_threshold: float = 1.0,
                          use_detection_val: bool = True,
                          ignore_too_much: bool = False,
                          p_max: int = 90,
                          interpret: bool = False
                          ) -> Tuple[jax.Array, jax.Array]:
    """Batched grouping, one grid step per joint (lockstep over B).

    Same contract as
    :func:`rtpe_tpu.ops.pallas_group.match_by_tag_kernel` with the
    greedy solver: (people (B, p_max, J, 3+D) f32, n_people (B,) i32).
    """
    b, j, k, d = tag_k.shape
    m = max_num_people
    assert k <= _ROWS and 2 * m + 1 <= _LANES and p_max <= _PSLOTS
    assert k <= m and p_max < _NO_SLOT

    f32 = jnp.float32
    bp = max(8, -(-b // 8) * 8)  # sublane-tile-aligned batch pad
    pad_rows = _ROWS - k

    def prep(x, fill):
        x = jnp.pad(x.astype(f32),
                    ((0, bp - b), (0, 0), (0, pad_rows), (0, 0)),
                    constant_values=fill)
        return jnp.transpose(x, (1, 3, 0, 2))  # (J, C, Bp, _ROWS)

    tag_p = prep(tag_k, 0.0)
    loc_p = prep(loc_k, 0.0)
    # padded rows/images get val = -1: below any detection threshold,
    # so they never match, never spawn people, and padded images end
    # with n_people = 0
    val_p = prep(val_k[..., None], -1.0)

    kern = partial(_lockstep_kernel, k=k, m=m, d=d, p_max=p_max,
                   detection_threshold=detection_threshold,
                   tag_threshold=tag_threshold,
                   use_detection_val=use_detection_val,
                   ignore_too_much=ignore_too_much)

    slots, _, _, _, nppl = pl.pallas_call(
        kern,
        grid=(j,),
        in_specs=[
            pl.BlockSpec((1, d, bp, _ROWS), lambda jj: (jj, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, bp, _ROWS), lambda jj: (jj, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bp, _ROWS), lambda jj: (jj, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bp, _LANES), lambda jj: (jj, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp, _LANES), lambda jj: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bp, _LANES), lambda jj: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp, _LANES), lambda jj: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp, _LANES), lambda jj: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((j, bp, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, bp, _LANES), f32),
            jax.ShapeDtypeStruct((d, bp, _LANES), f32),
            jax.ShapeDtypeStruct((1, bp, _LANES), f32),
            jax.ShapeDtypeStruct((1, bp, _LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tag_p, loc_p, val_p)

    # ---- XLA people-table reconstruction from the slot decisions.
    # Row r's people row is [x, y, val, tag_0..tag_{D-1}]; within one
    # joint multiple rows may write one slot — last writer wins, which
    # an argmax over the row index reproduces exactly.
    slots_bjk = jnp.transpose(slots[:, :b, :k], (1, 0, 2))  # (B, J, K)
    rowvec = jnp.concatenate(
        [loc_k.astype(f32), val_k[..., None].astype(f32),
         tag_k.astype(f32)], axis=-1)                   # (B, J, K, 3+D)
    hit = slots_bjk[..., None] == jnp.arange(p_max)     # (B, J, K, P)
    rid = jnp.arange(1, k + 1, dtype=jnp.int32)[None, None, :, None]
    win = jnp.max(jnp.where(hit, rid, 0), axis=2)       # (B, J, P)
    gathered = jnp.take_along_axis(
        rowvec, jnp.maximum(win - 1, 0)[..., None], axis=2)
    people = jnp.where((win > 0)[..., None], gathered, 0.0)
    people = jnp.transpose(people, (0, 2, 1, 3))        # (B, P, J, ·)
    return people, nppl[0, :b, 0]
