"""End-to-end quantitative validation: ideal heatmaps -> decode -> AP.

Renders perfect Gaussian heatmaps + per-person tag maps from the
synthetic COCO fixture's ground truth, runs the full decode stack and
the OKS evaluator, and checks the scores a correct pipeline must
produce (AP@0.50 = 1.0; mean AP high but < 1 is expected because the
quarter-pixel adjust shifts ideal peaks by up to 0.75 px).  This is the
same isolation strategy the reference uses with its precomputed teacher
outputs (``dataloader_demo.py:90-121``).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from test_data_eval import _make_coco_fixture

from rtpe_tpu.data import CocoDistillationDataset, HeatmapGenerator
from rtpe_tpu.decode import HeatmapParser


def _render_ideal(joints, hw, num_joints=17, sigma=2.0):
    """(P, J, 3) joints -> (H, W, J) heatmaps + per-person tag map."""
    gen = HeatmapGenerator(num_joints, sigma)
    det = np.transpose(gen(joints, hw), (1, 2, 0))
    tag = np.zeros((*hw, num_joints), np.float32)
    for p, person in enumerate(joints):
        tval = 2.0 * (p + 1)
        for j in range(num_joints):
            x, y, v = person[j]
            if v > 0:
                xi, yi = int(x), int(y)
                y0, y1 = max(0, yi - 4), min(hw[0], yi + 5)
                x0, x1 = max(0, xi - 4), min(hw[1], xi + 5)
                tag[y0:y1, x0:x1, j] = tval
    return det, tag


@pytest.mark.parametrize("decode_mode", ["host", "fused"])
def test_ideal_heatmaps_reach_full_ap50(tmp_path, decode_mode):
    root = str(tmp_path)
    _make_coco_fixture(root, n_imgs=3, hw=(128, 160))
    ds = CocoDistillationDataset(root, "val2017")
    parser = HeatmapParser(num_joints=17, max_num_people=30)

    all_preds, all_scores = [], []
    for i in range(len(ds)):
        s = ds[i]
        det, tag = _render_ideal(s["joints"], s["mask"].shape)
        dj, tj = jnp.asarray(det[None]), jnp.asarray(tag[None])
        if decode_mode == "host":
            grouped, scores = parser.parse(dj, tj, on_device=False)
        else:
            grouped, scores = parser.parse_fused(dj, tj)
        people = [p for p in grouped[0] if np.asarray(p).size > 0]
        all_preds.append(people)
        all_scores.append(scores)
        assert len(people) == s["joints"].shape[0], \
            f"img {i}: found {len(people)} of {s['joints'].shape[0]}"

    stats = ds.evaluate(all_preds, all_scores, output_dir=root)
    assert stats["Ap .5"] == pytest.approx(1.0)
    assert stats["AR .5"] == pytest.approx(1.0)
    assert stats["AP"] > 0.6  # quarter-pixel adjust costs the top OKS bins
    # results-file contract
    import os
    assert os.path.exists(os.path.join(
        root, "results", "keypoints_val2017_results.json"))


@pytest.mark.slow
def test_pose_predictor_api(tmp_path):
    """PosePredictor: raw image in, original-coordinate people out."""
    import jax

    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.models import HRNetConfig, PoseHigherHRNet, StageCfg

    cfg = HRNetConfig(
        num_joints=17, stage2=StageCfg(1, 2, "BASIC", (1, 1), (8, 16)),
        stage3=StageCfg(1, 3, "BASIC", (1, 1, 1), (8, 16, 32)),
        stage4=StageCfg(1, 4, "BASIC", (1, 1, 1, 1), (8, 16, 32, 64)),
        deconv_chans=(8,), deconv_num_blocks=1)
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    pred = PosePredictor(model, variables, input_size=128)
    img = (np.random.RandomState(0).rand(100, 140, 3) * 255
           ).astype(np.uint8)
    people, scores = pred.predict(img)
    assert isinstance(people, list) and isinstance(scores, list)
    for p in people:
        p = np.asarray(p)
        assert p.shape[0] == 17
        # coordinates mapped back into (roughly) original image range
        assert p[:, 0].max() < 140 * 1.5 and p[:, 1].max() < 100 * 1.5


def test_pose_predictor_fused_decode(tmp_path):
    """PosePredictor(fused_decode=True) — the TPU default — drives the
    fused batch decode end-to-end through predict/predict_batch."""
    import jax

    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.models import HRNetConfig, PoseHigherHRNet, StageCfg

    cfg = HRNetConfig(
        num_joints=17, stage2=StageCfg(1, 2, "BASIC", (1, 1), (8, 16)),
        stage3=StageCfg(1, 3, "BASIC", (1, 1, 1), (8, 16, 32)),
        stage4=StageCfg(1, 4, "BASIC", (1, 1, 1, 1), (8, 16, 32, 64)),
        deconv_chans=(8,), deconv_num_blocks=1)
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    pred = PosePredictor(model, variables, input_size=128,
                         fused_decode=True)
    assert pred.fused_decode
    rng = np.random.RandomState(0)
    img = (rng.rand(100, 140, 3) * 255).astype(np.uint8)
    people, scores = pred.predict(img)
    assert isinstance(people, list) and isinstance(scores, list)
    outs = pred.predict_batch([img, (rng.rand(100, 140, 3) * 255
                                     ).astype(np.uint8)])
    assert len(outs) == 2
    for ppl, sc in outs:
        assert isinstance(ppl, list) and isinstance(sc, list)


def test_parse_fused_batch_matches_parse_batch(tmp_path):
    """The fused batch decode (PosePredictor's TPU default since r4)
    finds the same people as the hybrid host-grouping parse_batch on
    the ideal-scene fixture — count, joints (within the refine path's
    tolerance), and scores."""
    root = str(tmp_path)
    _make_coco_fixture(root, n_imgs=3, hw=(128, 160))
    ds = CocoDistillationDataset(root, "val2017")
    parser = HeatmapParser(num_joints=17, max_num_people=30)

    det_b, tag_b = [], []
    for i in range(len(ds)):
        s = ds[i]
        det, tag = _render_ideal(s["joints"], s["mask"].shape)
        det_b.append(det)
        tag_b.append(tag)
    dj = jnp.asarray(np.stack(det_b))
    tj = jnp.asarray(np.stack(tag_b))

    ref_p, ref_s = parser.parse_batch(dj, tj, adjust=True, refine=True)
    got_p, got_s = parser.parse_fused_batch(dj, tj)
    for i in range(len(ds)):
        assert len(got_p[i]) == len(ref_p[i]), i
        # match people by mean joint position (ordering may differ)
        ref_cent = [np.asarray(p)[:, :2].mean(0) for p in ref_p[i]]
        for p, sc in zip(got_p[i], got_s[i]):
            c = np.asarray(p)[:, :2].mean(0)
            d = min(np.linalg.norm(c - rc) for rc in ref_cent)
            assert d < 2.0, (i, d)
        np.testing.assert_allclose(sorted(got_s[i]), sorted(ref_s[i]),
                                   rtol=0.05, atol=0.05)


def test_eval_student_engine_with_oracle_model(tmp_path):
    """Drive eval/engine.py end-to-end with an oracle 'model' that
    emits the ideal heatmaps+tags for whatever image it is given."""
    from rtpe_tpu.eval.engine import eval_student

    root = str(tmp_path)
    _make_coco_fixture(root, n_imgs=2, hw=(128, 160))
    ds = CocoDistillationDataset(root, "val2017")
    parser = HeatmapParser(num_joints=17, max_num_people=30)

    oracle = {}
    for i in range(len(ds)):
        s = ds[i]
        det, tag = _render_ideal(s["joints"], s["mask"].shape)
        oracle[s["img"].shape[:2] + (i,)] = np.concatenate(
            [det, tag], axis=-1)
    idx = {"i": 0}

    def apply_fn(img_nhwc, out_hw):
        s = ds[idx["i"]]
        det, tag = _render_ideal(s["joints"], s["mask"].shape)
        idx["i"] += 1
        return jnp.asarray(np.concatenate([det, tag], axis=-1)[None])

    stats = eval_student(apply_fn, parser, ds, num_heatmaps=17,
                         save_every=1, save_dir=str(tmp_path))
    assert stats["Ap .5"] == pytest.approx(1.0)
    import os
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "student_minival_0.jpg"))


def test_crowded_tied_scene_fused_vs_host_ap(tmp_path):
    """AP impact of the jit-Hungarian tie-break divergence (quantified
    in decode/group_jit.py): on a crowded scene with overlapping people
    and NEAR-TIED tags — the regime where assignment ties happen — the
    fused device decode must stay within 0.05 AP of the host oracle."""
    import json
    import os

    import cv2

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "annotations"))
    os.makedirs(os.path.join(root, "images", "val2017"))
    rng = np.random.RandomState(0)
    h, w = 128, 160
    images, annotations = [], []
    aid = 1
    for i in range(2):
        img_id = 2000 + i
        fname = f"{img_id:012d}.jpg"
        cv2.imwrite(os.path.join(root, "images", "val2017", fname),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
        images.append({"id": img_id, "file_name": fname,
                       "height": h, "width": w})
        # five people crammed into one quadrant (overlapping parts)
        for p in range(5):
            cx = 30 + p * 12
            cy = 40 + (p % 2) * 10
            kps = []
            for j in range(17):
                kps += [cx + (j % 5) * 4, cy + (j // 5) * 6, 2]
            annotations.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": 17, "iscrowd": 0,
                "area": 600.0, "bbox": [cx - 3, cy - 3, 22, 28],
                "segmentation": [[cx - 3, cy - 3, cx + 19, cy - 3,
                                  cx + 19, cy + 25, cx - 3, cy + 25]]})
            aid += 1
    with open(os.path.join(root, "annotations",
                           "person_keypoints_val2017.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person",
                                   "keypoints": ["k"] * 17}]}, f)

    ds = CocoDistillationDataset(root, "val2017")
    parser = HeatmapParser(num_joints=17, max_num_people=30)

    from rtpe_tpu.decode.fused import decode_full

    stats = {}
    for mode in ("host", "fused", "greedy"):
        all_preds, all_scores = [], []
        for i in range(len(ds)):
            s = ds[i]
            det, tag = _render_ideal(s["joints"], s["mask"].shape)
            # near-tied tags: people separated by only ~0.6 in tag space
            # (threshold 1.0), plus noise — the tie-prone regime
            tag = tag * 0.3 + rng.randn(*tag.shape).astype(np.float32) * 0.01
            dj, tj = jnp.asarray(det[None]), jnp.asarray(tag[None])
            if mode == "host":
                grouped, scores = parser.parse(dj, tj, on_device=False)
            elif mode == "fused":
                grouped, scores = parser.parse_fused(dj, tj)
            else:
                # the greedy mega-kernel (single-image auto path on
                # TPU, VERDICT r3 item 3): people-level claim is
                # AP-level equality on exactly this tie-prone regime
                ppl, n, sc = decode_full(dj, tj,
                                         lap="greedy_interpret")
                n = int(n)
                grouped = [[np.asarray(ppl[k]) for k in range(n)]]
                scores = [float(s_) for s_ in np.asarray(sc[:n])]
            people = [p for p in grouped[0] if np.asarray(p).size > 0]
            all_preds.append(people)
            all_scores.append(scores)
        stats[mode] = ds.evaluate(all_preds, all_scores)

    assert stats["host"]["Ap .5"] > 0.5  # the scene is decodable at all
    for mode in ("fused", "greedy"):
        assert abs(stats[mode]["AP"] - stats["host"]["AP"]) <= 0.05, \
            (mode, stats)
        assert abs(stats[mode]["Ap .5"] - stats["host"]["Ap .5"]) \
            <= 0.05, (mode, stats)
