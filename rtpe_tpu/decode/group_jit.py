"""Jittable associative-embedding grouping.

Fixed-shape re-expression of the reference grouping procedure
(``group.py:26-97``) so the *entire* decode — NMS, top-k, grouping,
adjust, refine — can run as one device program with one dispatch and
one host pull.

State is a fixed people table (P_MAX slots) updated by a scan over
joints; the per-joint Hungarian runs on a fixed 60×60 cost matrix
(30 detection rows + 30 dummy rows vs up to 30 person columns + dummy
"found-new-person" columns at 1e10, reproducing the reference's
padding).  The float-keyed dict semantics (insertion order, key
collisions resetting the tag list) are reproduced with an explicit key
table.

Known divergence: on exact cost ties the Hungarian may pick a different
optimal assignment than munkres (same total cost).  Quantified on
synthetic scenes: all tag-per-joint scenes bit-match the host path;
with a single shared tag map (tag_per_joint=False, where exact float
ties between person columns are common) 7 of 20 heavily-degenerate
scenes resolve ties differently at sub-1e-3 cost deltas the fp32 solver
cannot order like float64 munkres.  Real-valued embeddings do not tie
exactly; the host path in ``group.py`` remains the bit-exact oracle and
the default.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .hungarian_jit import hungarian_rect
from ..ops.pallas_lap import hungarian_rect_pallas

# fp32 sentinel design: the Hungarian runs in fp32 on device, so the
# sentinels must not swallow real cost differences (ulp(1e10) ≈ 1024!).
# Outcomes only depend on cost ORDER among candidates below the tag
# threshold, so real costs are clamped to <= 1000 (differences among
# farther candidates are outcome-equivalent: all fail the threshold
# gate and found new people); dummies sit just above, fully resolvable.
COST_CLAMP = jnp.float32(1000.0)
BIG = jnp.float32(2048.0)    # valid row -> dummy col ("new person")
HUGE = jnp.float32(4096.0)   # forbidden cells


@partial(jax.jit, static_argnames=("max_num_people", "detection_threshold",
                                   "tag_threshold", "use_detection_val",
                                   "ignore_too_much", "p_max", "lap"))
def match_by_tag_jit(tag_k: jax.Array, loc_k: jax.Array, val_k: jax.Array,
                     max_num_people: int = 30,
                     detection_threshold: float = 0.1,
                     tag_threshold: float = 1.0,
                     use_detection_val: bool = True,
                     ignore_too_much: bool = False,
                     p_max: int = 90,
                     lap: str = "xla") -> Tuple[jax.Array, jax.Array]:
    """Group one image's top-k detections.

    :param tag_k: (J, K, D); :param loc_k: (J, K, 2); :param val_k: (J, K).
    :param lap: LAP solver: ``"xla"`` (lax.while_loop Hungarian,
      vmap-friendly), ``"pallas"`` (Mosaic kernel,
      :mod:`rtpe_tpu.ops.pallas_lap` — ~1.3x lower single-image
      latency; TPU only), or ``"pallas_interpret"`` (same kernel on
      the Pallas interpreter, for CPU tests).
    :returns: (people (p_max, J, 3+D), n_people scalar int32); people
      rows beyond n_people are zeros.
    """
    j, k, d = tag_k.shape
    tag_k = tag_k.astype(jnp.float32)
    loc_k = loc_k.astype(jnp.float32)
    val_k = val_k.astype(jnp.float32)

    people0 = jnp.zeros((p_max, j, 3 + d), jnp.float32)
    keys0 = jnp.full((p_max,), jnp.inf, jnp.float32)
    tag_sum0 = jnp.zeros((p_max, d), jnp.float32)
    tag_cnt0 = jnp.zeros((p_max,), jnp.float32)
    n0 = jnp.int32(0)

    m = max_num_people  # person columns considered for matching

    def per_joint(state, inputs):
        people, keys, tag_sum, tag_cnt, n_people = state
        idx, tags, locs, vals = inputs
        dets = jnp.concatenate([locs, vals[:, None], tags], axis=1)
        det_valid = vals > detection_threshold

        p_cur = jnp.minimum(n_people, m)
        skip_all = jnp.bool_(ignore_too_much) & (p_cur == m)

        mean_tags = tag_sum[:m] / jnp.maximum(tag_cnt[:m], 1.0)[:, None]
        diff = tags[:, None, :] - mean_tags[None, :, :]  # (K, m, D)
        diff_saved = jnp.sqrt(jnp.sum(diff * diff, axis=2))  # (K, m)
        if use_detection_val:
            diff_normed = jnp.round(diff_saved) * 100.0 - vals[:, None]
        else:
            diff_normed = diff_saved
        diff_normed = jnp.minimum(diff_normed, COST_CLAMP)

        col_real = jnp.arange(2 * m)[None, :] < p_cur  # (1, 2m)
        row_valid = det_valid[:, None]  # (K, 1)
        # RECTANGULAR cost (K dets x 2m cols): the square form's dummy
        # detection rows only absorbed unmatched columns, which
        # hungarian_rect handles natively — half the sequential row
        # insertions of the device LAP (the decode's latency floor).
        # tiny bias replicates munkres' tie-breaking (the rounded tag
        # distances tie frequently): lower rows get lower columns.
        # (2m - r) * c summed over an assignment is minimized when
        # early rows take early columns (rearrangement inequality).
        rows_f = jnp.arange(k, dtype=jnp.float32)[:, None]
        cols_f = jnp.arange(2 * m, dtype=jnp.float32)[None, :]
        tie_bias = (2 * m - rows_f) * cols_f * jnp.float32(1e-8)
        block = jnp.where(
            col_real,
            jnp.pad(diff_normed, ((0, 0), (0, m)), constant_values=0.0)
            + tie_bias,
            BIG)  # valid rows: real cols -> cost, dummy cols -> BIG
        cost = jnp.where(row_valid, block,
                         jnp.where(col_real, HUGE, 0.0))

        if lap == "pallas":
            assign = hungarian_rect_pallas(cost)
        elif lap == "pallas_interpret":
            assign = hungarian_rect_pallas(cost, interpret=True)
        else:
            assign = hungarian_rect(cost)  # (K,) col of each det row

        def per_row(row, st):
            people, keys, tag_sum, tag_cnt, n_people = st
            col = assign[row]
            active = det_valid[row] & (~skip_all)
            matched = active & (col < p_cur) & \
                (diff_saved[row, jnp.clip(col, 0, m - 1)] < tag_threshold)
            is_new = active & (~matched)

            det_row = dets[row]
            trow = tags[row]

            # matched update
            slot_m = jnp.clip(col, 0, p_max - 1)
            people = jnp.where(
                matched,
                people.at[slot_m, idx].set(det_row), people)
            tag_sum = jnp.where(
                matched, tag_sum.at[slot_m].add(trow), tag_sum)
            tag_cnt = jnp.where(
                matched, tag_cnt.at[slot_m].add(1.0), tag_cnt)

            # new person (with float-key merge: setdefault semantics)
            key = trow[0]
            slot_ids = jnp.arange(p_max)
            key_hit = (keys == key) & (slot_ids < n_people)
            has_hit = jnp.any(key_hit)
            hit_slot = jnp.argmax(key_hit)
            app_slot = jnp.minimum(n_people, p_max - 1)
            slot_n = jnp.where(has_hit, hit_slot, app_slot)
            people = jnp.where(
                is_new, people.at[slot_n, idx].set(det_row), people)
            # reference resets the tag list on the new/merge branch
            # (group.py:94: tag_dict[key] = [tags[row]])
            tag_sum = jnp.where(is_new, tag_sum.at[slot_n].set(trow),
                                tag_sum)
            tag_cnt = jnp.where(is_new, tag_cnt.at[slot_n].set(1.0),
                                tag_cnt)
            keys = jnp.where(is_new & (~has_hit),
                             keys.at[slot_n].set(key), keys)
            n_people = jnp.where(is_new & (~has_hit),
                                 jnp.minimum(n_people + 1, p_max),
                                 n_people)
            return people, keys, tag_sum, tag_cnt, n_people

        state = jax.lax.fori_loop(
            0, k, per_row, (people, keys, tag_sum, tag_cnt, n_people))
        return state, None

    inputs = (jnp.arange(j), tag_k, loc_k, val_k)
    (people, keys, tag_sum, tag_cnt, n_people), _ = jax.lax.scan(
        per_joint, (people0, keys0, tag_sum0, tag_cnt0, n0), inputs)
    return people, n_people
