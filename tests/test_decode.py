"""Decode-stack parity vs the reference grouping implementation.

The reference depends on the pure-python ``munkres`` package (not
installed); a scipy-backed shim with identical semantics (zero-pad to
square, return only original-cell pairs) stands in for it so the
reference module can run as ground truth.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

from rtpe_tpu.decode import HeatmapParser, munkres_assign
from rtpe_tpu.native import build as build_native, lap_solve


def _install_munkres_shim():
    from scipy.optimize import linear_sum_assignment

    class Munkres:
        def compute(self, cost):
            cost = np.asarray(cost, dtype=float)
            n, m = cost.shape
            k = max(n, m)
            sq = np.zeros((k, k))
            sq[:n, :m] = cost
            rows, cols = linear_sum_assignment(sq)
            return [(int(r), int(c)) for r, c in zip(rows, cols)
                    if r < n and c < m]

    mod = types.ModuleType("munkres")
    mod.Munkres = Munkres
    sys.modules.setdefault("munkres", mod)


def _make_scene(seed=0, h=64, w=80, num_people=3, num_joints=17,
                tag_per_joint=True, sigma=2.0):
    """Plant gaussian peaks with per-person tag values."""
    rng = np.random.RandomState(seed)
    det = np.zeros((h, w, num_joints), np.float32)
    tdim = num_joints if tag_per_joint else 1
    tag = rng.randn(h, w, tdim).astype(np.float32) * 0.05
    yy, xx = np.mgrid[0:h, 0:w]
    for p in range(num_people):
        tval = float(p) * 2.0
        for j in range(num_joints):
            if rng.rand() < 0.2:
                continue  # some missing joints
            cx = rng.randint(4, w - 4)
            cy = rng.randint(4, h - 4)
            g = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sigma ** 2))
            det[:, :, j] = np.maximum(det[:, :, j],
                                      g * rng.uniform(0.5, 1.0))
            ti = j if tag_per_joint else 0
            blob = g > 0.3
            tag[blob, ti] = tval + rng.randn() * 0.05
    return det, tag


def test_lap_matches_scipy_on_random():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(1)
    for k in (1, 2, 5, 13, 30):
        cost = rng.rand(k, k)
        r1, c1 = lap_solve(cost)
        r2, c2 = linear_sum_assignment(cost)
        assert cost[r1, c1].sum() == pytest.approx(cost[r2, c2].sum())


def test_native_lap_builds_and_matches():
    ok = build_native(verbose=True)
    assert ok, "g++ build of librtpe_native.so failed"
    from rtpe_tpu import native
    lib = native._load_lib()
    assert lib is not None
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(7)
    for k in (3, 10, 30, 60):
        cost = rng.rand(k, k) * 100
        r, c = lap_solve(cost)
        assert sorted(c) == list(range(k))
        r2, c2 = linear_sum_assignment(cost)
        assert cost[r, c].sum() == pytest.approx(cost[r2, c2].sum())


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
@pytest.mark.parametrize("tag_per_joint", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_parse_matches_reference(tag_per_joint, seed):
    _install_munkres_shim()
    add_reference_to_path()
    from rtpe.third_party.group import HeatmapParser as RefParser

    det, tag = _make_scene(seed=seed, tag_per_joint=tag_per_joint)
    h, w, j = det.shape
    kw = dict(num_joints=17, max_num_people=30, detection_threshold=0.1,
              tag_threshold=1.0, use_detection_val=True,
              ignore_too_much=False, tag_per_joint=tag_per_joint,
              nms_ksize=5, nms_padding=2)

    ref = RefParser(**kw)
    t_det = torch.from_numpy(det.transpose(2, 0, 1)[None])
    t_tag = torch.from_numpy(tag.transpose(2, 0, 1)[None]).unsqueeze(-1)
    ref_ans, ref_scores = ref.parse(t_det, t_tag, adjust=True, refine=True)

    ours = HeatmapParser(**kw)
    j_det = jnp.asarray(det[None])
    j_tag = jnp.asarray(tag[None])
    for on_device in (False, True):
        our_ans, our_scores = ours.parse(j_det, j_tag, adjust=True,
                                         refine=True, on_device=on_device)
        ref_people = ref_ans[0]
        our_people = our_ans[0]
        assert len(ref_people) == len(our_people), f"device={on_device}"
        np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-5,
                                   atol=1e-6)
        for rp, op in zip(ref_people, our_people):
            np.testing.assert_allclose(op, rp, rtol=1e-4, atol=1e-4,
                                       err_msg=f"device={on_device}")


@pytest.mark.parametrize("tag_per_joint", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_parse_fused_matches_host(tag_per_joint, seed):
    """The single-dispatch fused decode must equal the host decode
    (which is itself reference-exact)."""
    det, tag = _make_scene(seed=seed, tag_per_joint=tag_per_joint)
    kw = dict(num_joints=17, max_num_people=30, detection_threshold=0.1,
              tag_threshold=1.0, use_detection_val=True,
              ignore_too_much=False, tag_per_joint=tag_per_joint)
    p = HeatmapParser(**kw)
    j_det = jnp.asarray(det[None])
    j_tag = jnp.asarray(tag[None])
    host_ans, host_scores = p.parse(j_det, j_tag, on_device=False)
    fused_ans, fused_scores = p.parse_fused(j_det, j_tag)
    assert len(fused_ans[0]) == len(host_ans[0])
    np.testing.assert_allclose(fused_scores, host_scores, rtol=1e-5,
                               atol=1e-6)
    for fp, hp in zip(fused_ans[0], host_ans[0]):
        np.testing.assert_allclose(fp, hp, rtol=1e-4, atol=1e-4)


def test_decode_full_batch_matches_single():
    """The vmapped batched fused decode equals per-image decode_full
    (same lockstep algorithm, batched lanes)."""
    from rtpe_tpu.decode.fused import decode_full, decode_full_batch

    dets, tags = [], []
    for seed in (0, 1, 2):
        det, tag = _make_scene(seed=seed, tag_per_joint=True)
        dets.append(det)
        tags.append(tag)
    det_b = jnp.asarray(np.stack(dets))
    tag_b = jnp.asarray(np.stack(tags))
    people_b, n_b, scores_b = decode_full_batch(det_b, tag_b)
    for i in range(3):
        people_i, n_i, scores_i = decode_full(det_b[i:i + 1],
                                              tag_b[i:i + 1])
        assert int(n_b[i]) == int(n_i)
        np.testing.assert_allclose(np.asarray(people_b[i]),
                                   np.asarray(people_i),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(scores_b[i]),
                                   np.asarray(scores_i),
                                   rtol=1e-5, atol=1e-5)


def test_rect_hungarian_matches_square_on_decode_costs():
    """hungarian_rect on the (K, 2m) detection block equals the square
    60x60 form (dummy rows only absorbed unmatched columns)."""
    from scipy.optimize import linear_sum_assignment

    from rtpe_tpu.decode.hungarian_jit import hungarian_rect

    rng = np.random.RandomState(0)
    for trial in range(20):
        k, m = 30, 30
        p_cur = rng.randint(0, m + 1)
        n_valid = rng.randint(0, k + 1)
        valid = np.zeros(k, bool)
        valid[rng.permutation(k)[:n_valid]] = True
        # decode-shaped costs: quantized distances minus val on real
        # cols; BIG on dummy cols for valid rows; HUGE/0 for invalid
        cost = np.zeros((k, 2 * m), np.float32)
        real = np.arange(2 * m) < p_cur
        base = (rng.randint(0, 11, (k, 2 * m)) * 100.0
                - rng.rand(k, 2 * m)).astype(np.float32)
        cost[:, :] = np.where(real[None, :],
                              np.minimum(base, 1000.0), 2048.0)
        cost[~valid] = np.where(real[None, :], 4096.0, 0.0)[0]
        got = np.asarray(hungarian_rect(jnp.asarray(cost)))
        # scipy rectangular LAP = ground truth for total cost
        rows, cols = linear_sum_assignment(cost)
        want_total = cost[rows, cols].sum()
        got_total = cost[np.arange(k), got].sum()
        assert len(set(got.tolist())) == k  # distinct columns
        np.testing.assert_allclose(got_total, want_total, rtol=1e-6,
                                   err_msg=f"trial {trial}")


def test_jit_hungarian_optimal_vs_scipy():
    from scipy.optimize import linear_sum_assignment

    from rtpe_tpu.decode.hungarian_jit import hungarian
    rng = np.random.RandomState(11)
    for n in (1, 2, 7, 30, 60):
        cost = rng.rand(n, n) * rng.choice([1.0, 100.0, 1e10])
        col = np.asarray(hungarian(cost))
        assert sorted(col) == list(range(n))
        r2, c2 = linear_sum_assignment(cost)
        assert cost[np.arange(n), col].sum() == pytest.approx(
            cost[r2, c2].sum(), rel=1e-6)


def test_pallas_nms_topk_matches_jnp_interpret():
    """The fused Pallas kernel (interpret mode on CPU) must match the
    XLA top_k path exactly: values, coordinates, tie order."""
    from rtpe_tpu.decode.nms import top_k
    from rtpe_tpu.ops.pallas_decode import nms_topk_pallas

    det, tag = _make_scene(seed=5, h=48, w=64)
    j_det = jnp.asarray(det[None])
    val, x, y = nms_topk_pallas(j_det, max_people=30, ksize=5,
                                interpret=True)
    v2, loc2, _ = top_k(j_det, jnp.asarray(tag[None]), 30, 5, 2, True)
    np.testing.assert_allclose(np.asarray(val), np.asarray(v2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(x),
                                  np.asarray(loc2)[..., 0])
    np.testing.assert_array_equal(np.asarray(y),
                                  np.asarray(loc2)[..., 1])


def test_topk_tournament_matches_argmax_oracle():
    """The block-tournament top-k (the O(HW + k·NB) replacement for
    the k-pass argmax scan — the measured dominant cost of batched
    fused decode) is value- AND index-exact vs the oracle, including
    the regimes that stress tie order: NMS-suppressed planes that are
    ~all zeros (ties must resolve lowest-index-first), duplicate peak
    values within one block and across blocks, all-negative student
    logits, k larger than the number of distinct positives, and a
    non-multiple-of-block trailing axis."""
    from rtpe_tpu.decode.nms import _topk_by_argmax, _topk_tournament

    rng = np.random.default_rng(42)
    cases = []
    # near-all-zero NMS-style plane, few sparse peaks
    z = np.zeros((2, 3, 1000), np.float32)
    for b in range(2):
        for j in range(3):
            pk = rng.choice(1000, size=5, replace=False)
            z[b, j, pk] = rng.uniform(0.2, 1.0, size=5)
    cases.append((z, 30))
    # duplicate values in and across blocks (block=128)
    d = np.zeros((1, 2, 512), np.float32)
    d[0, 0, [3, 40, 130, 131, 400]] = 0.5         # cross/in-block ties
    d[0, 1, [0, 1, 2, 3]] = np.float32([0.7, 0.7, 0.7, 0.7])
    cases.append((d, 10))
    # all-negative logits, axis not a multiple of the block
    neg = -rng.uniform(0.1, 5.0, size=(2, 2, 333)).astype(np.float32)
    cases.append((neg, 8))
    # dense random with many repeats (quantized to force ties)
    q = np.round(rng.normal(size=(3, 4, 2048)) * 4).astype(np.float32)
    cases.append((q, 30))
    for flat, k in cases:
        v_o, i_o = _topk_by_argmax(jnp.asarray(flat), k)
        v_t, i_t = _topk_tournament(jnp.asarray(flat), k)
        np.testing.assert_array_equal(np.asarray(v_o), np.asarray(v_t))
        np.testing.assert_array_equal(np.asarray(i_o), np.asarray(i_t))


def test_adjust_refine_batch_cap_matches_per_image_oracle():
    """The slot-capped batched refine equals the per-image
    adjust_refine_device oracle in BOTH cond branches: when every
    image's occupancy fits the cap (cheap branch refines only
    people[:, :cap] — occupied slots are contiguous from 0 by the
    grouping's sequential allocation), and when one image exceeds it
    (full-envelope branch).  Also via decode_full_batch(refine_cap)."""
    from rtpe_tpu.decode.refine_device import (adjust_refine_batch,
                                               adjust_refine_device)

    rng = np.random.default_rng(3)
    B, H, W, J, D, P = 3, 32, 40, 4, 1, 12
    det = rng.uniform(0, 1, size=(B, H, W, J)).astype(np.float32)
    tag = rng.normal(size=(B, H, W, J, D)).astype(np.float32)

    def make_people(n_occ):
        ppl = np.zeros((P, J, 3 + D), np.float32)
        for p in range(n_occ):
            vis = rng.random(J) > 0.3
            vis[rng.integers(0, J)] = True
            ppl[p, vis, 0] = rng.uniform(1, W - 2, size=vis.sum())
            ppl[p, vis, 1] = rng.uniform(1, H - 2, size=vis.sum())
            ppl[p, vis, 2] = rng.uniform(0.2, 1.0, size=vis.sum())
            ppl[p, vis, 3] = rng.normal()
        return ppl

    for occ in ([2, 4, 1], [2, 9, 1]):   # cap=4: cheap / full branch
        people = np.stack([make_people(n) for n in occ])
        n_b = np.asarray(occ, np.int32)
        p_c, s_c = adjust_refine_batch(
            jnp.asarray(det), jnp.asarray(tag), jnp.asarray(people),
            jnp.asarray(n_b), cap=4)
        for b in range(B):
            p_o, s_o = adjust_refine_device(
                jnp.asarray(det[b]), jnp.asarray(tag[b]),
                jnp.asarray(people[b]))
            # slots beyond this image's occupancy are zero rows in the
            # input, hence inert in the oracle too — compare occupied
            np.testing.assert_allclose(np.asarray(p_c[b][:occ[b]]),
                                       np.asarray(p_o)[:occ[b]],
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(s_c[b]),
                                       np.asarray(s_o),
                                       rtol=1e-6, atol=1e-6)


def test_munkres_assign_rectangular_semantics():
    _install_munkres_shim()
    from munkres import Munkres
    rng = np.random.RandomState(3)
    for n, m in [(3, 5), (5, 5), (2, 7)]:
        cost = rng.rand(n, m)
        want = Munkres().compute(cost.tolist())
        got = [(int(r), int(c)) for r, c in munkres_assign(cost)
               if r < n and c < m]
        w_cost = sum(cost[r, c] for r, c in want)
        g_cost = sum(cost[r, c] for r, c in got)
        assert g_cost == pytest.approx(w_cost)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_fast_match_equals_oracle(seed):
    """Array-based production grouping == the quarantined oracle,
    including crowded scenes that exceed max_num_people."""
    from rtpe_tpu.decode.group import match_by_tag
    from rtpe_tpu.decode.group_fast import match_by_tag_fast

    rng = np.random.RandomState(seed)
    parser = HeatmapParser(num_joints=17, max_num_people=30)
    det = np.clip(rng.rand(1, 96, 96, 17) * 0.2, 0, 1).astype(np.float32)
    for _ in range(8):
        i, j = rng.randint(3, 92, 2)
        det[0, i:i + 3, j:j + 3, :] = rng.rand() * 0.5 + 0.5
    tag = (rng.randn(1, 96, 96, 17) * 0.3).astype(np.float32)
    vk, lk, tk = parser.top_k(jnp.asarray(det), jnp.asarray(tag))
    want = match_by_tag(tk[0], lk[0], vk[0], parser.params)
    got = match_by_tag_fast(tk[0], lk[0], vk[0], parser.params)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 1])
def test_parse_batch_equals_oracle_parse(seed):
    """parse_batch (adjust-in-topk + fast match + filtered batched
    device refine) == per-image oracle parse."""
    rng = np.random.RandomState(seed)
    parser = HeatmapParser(num_joints=17, max_num_people=30)
    B = 3
    det = np.clip(rng.rand(B, 64, 64, 17) * 0.2, 0, 1).astype(np.float32)
    for b in range(B):
        for _ in range(5):
            i, j = rng.randint(3, 60, 2)
            det[b, i:i + 3, j:j + 3, :] = rng.rand() * 0.5 + 0.5
    tag = (rng.randn(B, 64, 64, 17) * 0.5).astype(np.float32)
    dj, tj = jnp.asarray(det), jnp.asarray(tag)
    batch_ans, batch_scores = parser.parse_batch(dj, tj)
    for b in range(B):
        ans, scores = parser.parse(dj[b:b + 1], tj[b:b + 1], adjust=True,
                                   refine=True, on_device=False)
        assert len(ans[0]) == len(batch_ans[b])
        for rp, gp in zip(ans[0], batch_ans[b]):
            np.testing.assert_allclose(gp, rp, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(batch_scores[b], scores, rtol=1e-6)


def test_parse_batch_no_refine_needed_skips_device():
    """Images whose people are complete skip the refine dispatch but
    still return adjusted coordinates."""
    rng = np.random.RandomState(0)
    parser = HeatmapParser(num_joints=3, max_num_people=5)
    det = np.zeros((1, 32, 32, 3), np.float32)
    det[0, 10:13, 10:13, :] = 1.0  # all joints present at one spot
    tag = np.zeros((1, 32, 32, 3), np.float32)
    ans, scores = parser.parse_batch(jnp.asarray(det), jnp.asarray(tag))
    assert len(ans[0]) == 1
    person = ans[0][0]
    assert (person[:, 2] > 0).all()
    # quarter-pixel adjusted coordinates are fractional
    assert np.all(np.abs((person[:, 0] % 1) - 0.75) < 1e-6) or \
        np.all(np.abs((person[:, 0] % 1) - 0.25) < 1e-6)


def test_pallas_lap_optimal_vs_scipy_interpret():
    """The Mosaic LAP kernel (interpret mode on CPU) reaches scipy's
    optimal total cost on random rectangular instances, including
    decode-shaped sentinel costs."""
    from scipy.optimize import linear_sum_assignment

    from rtpe_tpu.ops.pallas_lap import hungarian_rect_pallas

    rng = np.random.RandomState(3)
    for trial in range(12):
        n = rng.randint(1, 31)
        m = rng.randint(n, 61)
        if trial % 3 == 0:
            # decode-shaped: quantized distances + BIG/HUGE sentinels
            cost = (rng.randint(0, 11, (n, m)) * 100.0
                    - rng.rand(n, m)).astype(np.float32)
            cost[:, rng.randint(0, m):] = 2048.0
        else:
            cost = (rng.rand(n, m) * 10).astype(np.float32)
        got = np.asarray(hungarian_rect_pallas(jnp.asarray(cost),
                                               interpret=True))
        rows, cols = linear_sum_assignment(cost)
        assert len(set(got.tolist())) == n  # distinct columns
        assert cost[np.arange(n), got].sum() == pytest.approx(
            cost[rows, cols].sum(), rel=1e-5, abs=1e-3), f"trial {trial}"


def test_group_kernel_matches_jit_interpret():
    """The grouping mega-kernel (one pallas_call: cost build + LAP +
    people-table update, interpret mode on CPU) equals
    match_by_tag_jit on random batched scenes, including the returned
    people counts."""
    from rtpe_tpu.decode.group_jit import match_by_tag_jit
    from rtpe_tpu.ops.pallas_group import match_by_tag_kernel

    rng = np.random.default_rng(0)
    B, J, K, D = 2, 4, 8, 1
    tags = (rng.normal(size=(B, J, K, D)) * 2).astype(np.float32)
    locs = rng.uniform(0, 64, size=(B, J, K, 2)).astype(np.float32)
    vals = rng.uniform(-0.2, 1.0, size=(B, J, K)).astype(np.float32)

    p_k, n_k = match_by_tag_kernel(
        jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
        max_num_people=K, interpret=True)
    for b in range(B):
        p_ref, n_ref = match_by_tag_jit(
            jnp.asarray(tags[b]), jnp.asarray(locs[b]),
            jnp.asarray(vals[b]), max_num_people=K)
        assert int(n_ref) == int(n_k[b])
        np.testing.assert_allclose(np.asarray(p_k[b]),
                                   np.asarray(p_ref), atol=1e-5)


def test_group_kernel_edge_cases_interpret():
    """Mega-kernel edge semantics: an empty scene returns zero people;
    duplicate float tag keys merge into one person (the reference's
    dict-setdefault quirk); ignore_too_much caps new allocations at
    max_num_people."""
    from rtpe_tpu.decode.group_jit import match_by_tag_jit
    from rtpe_tpu.ops.pallas_group import match_by_tag_kernel

    J, K, D = 3, 4, 1
    # empty: every val below the detection threshold
    tags = np.zeros((1, J, K, D), np.float32)
    locs = np.zeros((1, J, K, 2), np.float32)
    vals = np.full((1, J, K), -1.0, np.float32)
    p, n = match_by_tag_kernel(jnp.asarray(tags), jnp.asarray(locs),
                               jnp.asarray(vals), max_num_people=K,
                               interpret=True)
    assert int(n[0]) == 0
    assert np.all(np.asarray(p) == 0)

    # duplicate keys: all joints share one exact tag value -> joints
    # chain onto the same person slot via the float-key merge
    rng = np.random.default_rng(1)
    tags = np.full((1, J, K, D), 7.25, np.float32)
    tags[0, :, 2:, 0] = rng.normal(size=(J, K - 2)) * 5 + 100
    locs = rng.uniform(0, 32, size=(1, J, K, 2)).astype(np.float32)
    vals = rng.uniform(0.4, 1.0, size=(1, J, K)).astype(np.float32)
    for itm in (False, True):
        p_k, n_k = match_by_tag_kernel(
            jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
            max_num_people=K, ignore_too_much=itm, interpret=True)
        p_ref, n_ref = match_by_tag_jit(
            jnp.asarray(tags[0]), jnp.asarray(locs[0]),
            jnp.asarray(vals[0]), max_num_people=K,
            ignore_too_much=itm)
        assert int(n_ref) == int(n_k[0])
        np.testing.assert_allclose(np.asarray(p_k[0]),
                                   np.asarray(p_ref), atol=1e-5)


@pytest.mark.slow
def test_decode_full_batch_group_kernel_matches_xla():
    """decode_full_batch with the grouping mega-kernel (interpret)
    equals the XLA grouping end to end through adjust+refine."""
    from rtpe_tpu.decode.fused import decode_full_batch

    dets, tags = [], []
    for seed in (0, 1):
        det, tag = _make_scene(seed=seed, tag_per_joint=True)
        dets.append(det)
        tags.append(tag)
    j_det = jnp.asarray(np.stack(dets))
    j_tag = jnp.asarray(np.stack(tags))
    p_x, n_x, s_x = decode_full_batch(j_det, j_tag, lap="xla")
    p_k, n_k, s_k = decode_full_batch(j_det, j_tag,
                                      lap="kernel_interpret")
    np.testing.assert_array_equal(np.asarray(n_x), np.asarray(n_k))
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_x),
                               rtol=1e-5, atol=1e-5)


def test_decode_full_pallas_lap_matches_xla():
    """decode_full with the Mosaic LAP (interpret mode) equals the XLA
    solver end to end: the tie-bias makes optimal assignments unique on
    these scenes, so people tables must agree exactly."""
    from rtpe_tpu.decode.fused import decode_full

    for seed in (0, 1):
        det, tag = _make_scene(seed=seed, tag_per_joint=True)
        j_det = jnp.asarray(det[None])
        j_tag = jnp.asarray(tag[None])
        p_x, n_x, s_x = decode_full(j_det, j_tag, lap="xla")
        p_p, n_p, s_p = decode_full(j_det, j_tag,
                                    lap="pallas_interpret")
        assert int(n_x) == int(n_p)
        np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x),
                                   rtol=1e-5, atol=1e-5)


def test_kernel_selfcheck_interpret_and_auto_demotion():
    """The one-time auto->kernel parity probe (ADVICE r3): in interpret
    mode the mega-kernel passes on the non-degenerate fixture; on a
    non-TPU backend the auto resolution never selects the kernel (and
    never pays for the probe)."""
    import jax

    from rtpe_tpu.decode import fused

    assert fused.kernel_selfcheck(max_num_people=8, p_max=16,
                                  num_joints=4, d=1, interpret=True)
    # small shapes keep the interpret run cheap; the verdict is cached
    key = (8, 16, 4, 1, True, "lap")
    assert fused._SELFCHECK_CACHE[key] is True
    if jax.default_backend() != "tpu":
        assert fused._resolve_auto_lap(30, 90, 17, 1) == "xla"


def test_kernel_selfcheck_runs_under_an_outer_trace():
    """The gate's callers (decode_full / decode_full_batch) are jitted,
    so the probe ALWAYS executes at trace time — without the
    compile-time-eval escape its concrete int()/allclose() raised
    ConcretizationTypeError, and the except-arm 'demoted' auto off the
    mega-kernel on every production TPU decode while CPU CI (gate
    skipped) and the bench (RTPE_LAP_SELFCHECK=0) stayed green
    (found 2026-08-19).  The probe must return a genuine verdict, not
    warn, when invoked under a trace."""
    import warnings

    import jax
    import jax.numpy as jnp

    from rtpe_tpu.decode import fused

    key = (8, 16, 4, 1, True, "lockstep")
    fused._SELFCHECK_CACHE.pop(key, None)
    got = {}

    def f(x):
        got["ok"] = fused.kernel_selfcheck(
            max_num_people=8, p_max=16, num_joints=4, d=1,
            interpret=True, solver="lockstep")
        return x + 1.0

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any demotion warning fails
        jax.jit(f)(jnp.zeros(()))
    assert got["ok"] is True
    assert fused._SELFCHECK_CACHE[key] is True


def test_kernel_selfcheck_timeout_demotes_instead_of_hanging(monkeypatch):
    """The axon compile service can wedge a process at any compile; an
    unbounded probe would turn the one-time gate into an indefinite
    hang on the user's FIRST production decode.  A probe exceeding
    RTPE_LAP_SELFCHECK_TIMEOUT_S must demote (warn + False) promptly,
    abandoning — not joining — the hung worker thread."""
    import time
    import warnings

    from rtpe_tpu.decode import fused

    key = (8, 16, 4, 1, True, "greedy")
    fused._SELFCHECK_CACHE.pop(key, None)
    monkeypatch.setenv("RTPE_LAP_SELFCHECK_TIMEOUT_S", "0.5")

    orig = fused.pallas_group.match_by_tag_kernel

    def slow(*a, **k):
        time.sleep(3)
        return orig(*a, **k)

    monkeypatch.setattr(fused.pallas_group, "match_by_tag_kernel", slow)
    t0 = time.time()
    with warnings.catch_warnings(record=True) as ws:
        warnings.simplefilter("always")
        ok = fused.kernel_selfcheck(max_num_people=8, p_max=16,
                                    num_joints=4, d=1, interpret=True,
                                    solver="greedy")
    assert ok is False
    assert time.time() - t0 < 2.5  # returned at the budget, not at 3 s
    assert any("demoted" in str(w.message) for w in ws)
    fused._SELFCHECK_CACHE.pop(key, None)  # don't poison other tests


def test_group_kernel_greedy_matches_lap_on_separated_scenes():
    """The greedy assignment solver (VERDICT r3 item 3: the
    single-image latency path) equals the exact LAP kernel and
    match_by_tag_jit on scenes whose tags are well separated — the
    regime real trained models produce (greedy == optimal whenever no
    two detections contend for the same person within the threshold)."""
    from rtpe_tpu.decode.group_jit import match_by_tag_jit
    from rtpe_tpu.ops.pallas_group import match_by_tag_kernel

    rng = np.random.default_rng(3)
    B, J, K, D = 2, 5, 8, 1
    centers = np.linspace(-8.0, 8.0, 4)
    tags = np.zeros((B, J, K, D), np.float32)
    for b in range(B):
        for k in range(K):
            tags[b, :, k, :] = (centers[k % 4]
                                + rng.normal(size=(J, D)) * 0.05)
    locs = rng.uniform(0, 64, size=(B, J, K, 2)).astype(np.float32)
    vals = np.sort(rng.uniform(-0.2, 1.0, size=(B, J, K))
                   .astype(np.float32), axis=-1)[..., ::-1].copy()

    p_g, n_g = match_by_tag_kernel(
        jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
        max_num_people=K, interpret=True, solver="greedy")
    p_l, n_l = match_by_tag_kernel(
        jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
        max_num_people=K, interpret=True, solver="lap")
    for b in range(B):
        p_ref, n_ref = match_by_tag_jit(
            jnp.asarray(tags[b]), jnp.asarray(locs[b]),
            jnp.asarray(vals[b]), max_num_people=K)
        assert int(n_ref) == int(n_g[b]) == int(n_l[b])
        np.testing.assert_allclose(np.asarray(p_g[b]),
                                   np.asarray(p_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p_l[b]),
                                   np.asarray(p_ref), atol=1e-5)


def test_group_kernel_greedy_edge_cases_interpret():
    """Greedy solver edge semantics: empty scene returns zero people;
    the float-key merge ("setdefault") still chains same-key new
    persons onto one slot when no assignment contention exists (the
    contended all-equal-tags scene is exactly where greedy may
    legitimately diverge from the optimal LAP, so it is not asserted
    equal here)."""
    from rtpe_tpu.decode.group_jit import match_by_tag_jit
    from rtpe_tpu.ops.pallas_group import match_by_tag_kernel

    J, K, D = 3, 4, 1
    tags = np.zeros((1, J, K, D), np.float32)
    locs = np.zeros((1, J, K, 2), np.float32)
    vals = np.full((1, J, K), -1.0, np.float32)
    p, n = match_by_tag_kernel(jnp.asarray(tags), jnp.asarray(locs),
                               jnp.asarray(vals), max_num_people=K,
                               interpret=True, solver="greedy")
    assert int(n[0]) == 0 and np.all(np.asarray(p) == 0)

    # joint 0 only: two detections with the SAME tag key, no existing
    # people -> both are "new" and must merge into ONE slot (the
    # reference dict-setdefault quirk), identically to the exact path
    rng = np.random.default_rng(1)
    tags = np.zeros((1, J, K, D), np.float32)
    tags[0, 0, :2, 0] = 7.25
    tags[0, 0, 2:, 0] = 100.0 + np.arange(K - 2) * 50.0
    tags[0, 1:, :, 0] = 1e6  # joints 1+: all sub-threshold anyway
    locs = rng.uniform(0, 32, size=(1, J, K, 2)).astype(np.float32)
    vals = np.full((1, J, K), -1.0, np.float32)
    vals[0, 0] = np.linspace(1.0, 0.4, K, dtype=np.float32)
    p_g, n_g = match_by_tag_kernel(
        jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
        max_num_people=K, interpret=True, solver="greedy")
    p_ref, n_ref = match_by_tag_jit(
        jnp.asarray(tags[0]), jnp.asarray(locs[0]),
        jnp.asarray(vals[0]), max_num_people=K)
    assert int(n_ref) == int(n_g[0])
    np.testing.assert_allclose(np.asarray(p_g[0]), np.asarray(p_ref),
                               atol=1e-5)



def test_decode_full_greedy_matches_xla_on_scenes():
    """decode_full with the greedy mega-kernel (interpret) equals the
    XLA-Hungarian decode end to end on the synthetic scenes the AP
    tests use — people tables AND scores."""
    from rtpe_tpu.decode.fused import decode_full

    for seed in (0, 1):
        det, tag = _make_scene(seed=seed, tag_per_joint=True)
        j_det = jnp.asarray(det[None])
        j_tag = jnp.asarray(tag[None])
        p_x, n_x, s_x = decode_full(j_det, j_tag, lap="xla")
        p_g, n_g, s_g = decode_full(j_det, j_tag,
                                    lap="greedy_interpret")
        assert int(n_x) == int(n_g)
        np.testing.assert_allclose(np.asarray(p_g), np.asarray(p_x),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_x),
                                   rtol=1e-5, atol=1e-5)


def test_decode_full_batch_greedy_matches_xla_on_scenes():
    """decode_full_batch with the greedy mega-kernel (the TPU ``auto``
    pick since r4: 2.07 vs 5.55 ms/img at B=32 for the exact LAP)
    equals the XLA-Hungarian batch decode end to end — people tables
    AND scores, every image of a mixed-scene batch."""
    from rtpe_tpu.decode.fused import decode_full_batch

    det_b, tag_b = [], []
    for seed in (0, 1, 2, 3):
        det, tag = _make_scene(seed=seed, tag_per_joint=True)
        det_b.append(det)
        tag_b.append(tag)
    j_det = jnp.asarray(np.stack(det_b))
    j_tag = jnp.asarray(np.stack(tag_b))
    p_x, n_x, s_x = decode_full_batch(j_det, j_tag, lap="xla")
    p_g, n_g, s_g = decode_full_batch(j_det, j_tag,
                                      lap="greedy_interpret")
    np.testing.assert_array_equal(np.asarray(n_x), np.asarray(n_g))
    np.testing.assert_allclose(np.asarray(p_g), np.asarray(p_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_g), np.asarray(s_x),
                               rtol=1e-5, atol=1e-5)


def test_decode_full_batch_lockstep_matches_xla_on_scenes():
    """decode_full_batch with the LOCKSTEP greedy kernel (the TPU
    ``auto`` pick for batch decode since r4: 0.61 vs 12.11 ms per
    batch-32 crowded grouping) equals the XLA-Hungarian batch decode
    end to end — people tables AND scores, every image of a
    mixed-scene batch — and the one-time self-check passes for the
    lockstep solver in interpret mode."""
    from rtpe_tpu.decode import fused

    det_b, tag_b = [], []
    for seed in (0, 1, 2, 3):
        det, tag = _make_scene(seed=seed, tag_per_joint=True)
        det_b.append(det)
        tag_b.append(tag)
    j_det = jnp.asarray(np.stack(det_b))
    j_tag = jnp.asarray(np.stack(tag_b))
    p_x, n_x, s_x = fused.decode_full_batch(j_det, j_tag, lap="xla")
    p_l, n_l, s_l = fused.decode_full_batch(j_det, j_tag,
                                            lap="lockstep_interpret")
    np.testing.assert_array_equal(np.asarray(n_x), np.asarray(n_l))
    np.testing.assert_allclose(np.asarray(p_l), np.asarray(p_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_l), np.asarray(s_x),
                               rtol=1e-5, atol=1e-5)
    assert fused.kernel_selfcheck(max_num_people=8, p_max=16,
                                  num_joints=4, d=1, interpret=True,
                                  solver="lockstep")


@pytest.mark.parametrize("shape", [(3, 17, 30, 1), (1, 17, 30, 1),
                                   (5, 4, 8, 2), (8, 6, 12, 1)])
def test_group_lockstep_matches_greedy_kernel_interpret(shape):
    """The lockstep kernel (grid=(J,), batch on sublanes, slot-decision
    outputs + XLA people reconstruction) is row-for-row EQUAL to the
    grid=(B,J) greedy mega-kernel — same cost ordering, tie bias,
    threshold acceptance, setdefault merge, and last-writer-wins rows."""
    from rtpe_tpu.ops.pallas_group import match_by_tag_kernel
    from rtpe_tpu.ops.pallas_group_lockstep import match_by_tag_lockstep

    B, J, K, D = shape
    rng = np.random.default_rng(B * 100 + J)
    tags = rng.normal(size=(B, J, K, D)).astype(np.float32) * 2
    tags[..., 0] = np.round(tags[..., 0] * 2) / 2  # force key ties
    locs = rng.uniform(0, 128, size=(B, J, K, 2)).astype(np.float32)
    vals = np.sort(rng.uniform(-0.5, 1.0, size=(B, J, K))
                   .astype(np.float32), axis=-1)[..., ::-1].copy()
    for itm in (False, True):
        kw = dict(max_num_people=K, ignore_too_much=itm, p_max=90)
        p_g, n_g = match_by_tag_kernel(
            jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
            interpret=True, solver="greedy", **kw)
        p_l, n_l = match_by_tag_lockstep(
            jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
            interpret=True, **kw)
        np.testing.assert_array_equal(np.asarray(n_g), np.asarray(n_l))
        np.testing.assert_array_equal(np.asarray(p_g), np.asarray(p_l))


def test_group_lockstep_edge_cases_interpret():
    """Lockstep edge semantics equal the oracle path: empty scenes in a
    mixed batch return zero people (and don't disturb neighbors), and
    the float-key setdefault merge chains same-key new persons onto one
    slot."""
    from rtpe_tpu.decode.group_jit import match_by_tag_jit
    from rtpe_tpu.ops.pallas_group_lockstep import match_by_tag_lockstep

    J, K, D = 3, 4, 1
    rng = np.random.default_rng(1)
    # image 0: empty; image 1: the setdefault-merge scene
    tags = np.zeros((2, J, K, D), np.float32)
    tags[1, 0, :2, 0] = 7.25
    tags[1, 0, 2:, 0] = 100.0 + np.arange(K - 2) * 50.0
    tags[1, 1:, :, 0] = 1e6
    locs = rng.uniform(0, 32, size=(2, J, K, 2)).astype(np.float32)
    vals = np.full((2, J, K), -1.0, np.float32)
    vals[1, 0] = np.linspace(1.0, 0.4, K, dtype=np.float32)
    p, n = match_by_tag_lockstep(
        jnp.asarray(tags), jnp.asarray(locs), jnp.asarray(vals),
        max_num_people=K, interpret=True)
    assert int(n[0]) == 0 and np.all(np.asarray(p[0]) == 0)
    p_ref, n_ref = match_by_tag_jit(
        jnp.asarray(tags[1]), jnp.asarray(locs[1]),
        jnp.asarray(vals[1]), max_num_people=K)
    assert int(n_ref) == int(n[1])
    np.testing.assert_allclose(np.asarray(p[1]), np.asarray(p_ref),
                               atol=1e-5)
