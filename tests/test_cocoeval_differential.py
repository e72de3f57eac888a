"""Differential test: production OKS evaluator vs the pycocotools
transcription oracle (VERDICT r1 item 5).

``rtpe_tpu/eval/cocoeval.py`` is implemented from the COCO protocol;
``tests/pycoco_kpt_oracle.py`` is a loop-for-loop transcription of the
official ``COCOeval`` keypoint path.  Randomized scenes cover crowds,
zero-keypoint ground truths, area-range boundaries (32^2, 96^2),
score ties, more detections than maxDets, images with no gts and
images with no dts.  All 10 summary stats must match exactly.
"""

import json
import os

import numpy as np
import pytest

from pycoco_kpt_oracle import PycocoKptEval

from rtpe_tpu.data.coco import CocoAnnotations
from rtpe_tpu.eval.cocoeval import KeypointEvaluator


def _random_scene(seed):
    rng = np.random.RandomState(seed)
    n_imgs = rng.randint(1, 6)
    img_ids = [100 + i for i in range(n_imgs)]
    gts, dts = [], []
    aid = 1
    for img_id in img_ids:
        n_gt = rng.randint(0, 6)
        n_dt = rng.randint(0, 26)  # sometimes > maxDets(20)
        for _ in range(n_gt):
            # areas spanning small/medium/large incl. exact boundaries
            area = float(rng.choice(
                [500.0, 1024.0, 3000.0, 9216.0, 20000.0, 60000.0]))
            side = np.sqrt(area)
            cx, cy = rng.uniform(50, 400, 2)
            iscrowd = int(rng.rand() < 0.2)
            zero_kpt = rng.rand() < 0.15
            kps = []
            nk = 0
            for j in range(17):
                if zero_kpt:
                    kps += [0.0, 0.0, 0]
                else:
                    v = int(rng.choice([0, 1, 2]))
                    kps += [float(cx + rng.randn() * side / 4),
                            float(cy + rng.randn() * side / 4), v]
                    nk += int(v > 0)
            gts.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": 0 if zero_kpt else nk,
                "iscrowd": iscrowd, "area": area,
                "bbox": [cx - side / 2, cy - side / 2, side, side],
            })
            aid += 1
        for _ in range(n_dt):
            if n_gt and rng.rand() < 0.7:
                base = gts[-rng.randint(1, n_gt + 1)]
                bk = np.asarray(base["keypoints"], np.float64)
                noise = rng.randn(17, 2) * np.sqrt(base["area"]) / 8
                xs = bk[0::3] + noise[:, 0]
                ys = bk[1::3] + noise[:, 1]
            else:
                xs = rng.uniform(0, 500, 17)
                ys = rng.uniform(0, 500, 17)
            kps = []
            for j in range(17):
                kps += [float(xs[j]), float(ys[j]), 1.0]
            # quantized scores to exercise tie-breaking stability
            score = float(np.round(rng.rand(), 1))
            dts.append({"image_id": img_id, "category_id": 1,
                        "keypoints": kps, "score": score})
    return img_ids, gts, dts


def _production_stats(tmp_path, img_ids, gts, dts, tag):
    data = {
        "images": [{"id": i, "file_name": f"{i}.jpg",
                    "height": 512, "width": 512} for i in img_ids],
        "annotations": gts,
        "categories": [{"id": 1, "name": "person",
                        "keypoints": ["k"] * 17}],
    }
    path = os.path.join(str(tmp_path), f"ann_{tag}.json")
    with open(path, "w") as f:
        json.dump(data, f)
    coco = CocoAnnotations(path)
    return KeypointEvaluator(coco, img_ids=img_ids).evaluate(dts)


@pytest.mark.parametrize("block", range(5))
def test_cocoeval_matches_pycocotools_transcription(tmp_path, block):
    """20 random scenes per block => 100 scenes total, exact match."""
    for seed in range(block * 20, block * 20 + 20):
        img_ids, gts, dts = _random_scene(seed)
        want = PycocoKptEval(
            [dict(g) for g in gts], [dict(d) for d in dts], img_ids).run()
        got = _production_stats(tmp_path, img_ids, gts, dts, seed)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=1e-12), \
                (seed, k, got[k], want[k])


def test_cocoeval_empty_everything(tmp_path):
    img_ids = [1, 2]
    want = PycocoKptEval([], [], img_ids).run()
    got = _production_stats(tmp_path, img_ids, [], [], "empty")
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
