"""Data layer + evaluator tests: RLE, targets parity, COCO fixture, OKS AP."""

import json
import os
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

from rtpe_tpu.data import (
    CocoAnnotations,
    CocoDistillationDataset,
    HeatmapGenerator,
    polygons_to_mask,
    render_heatmaps,
    rle_decode,
    rle_encode,
    segmentation_to_mask,
)
from rtpe_tpu.eval import KeypointEvaluator


# -----------------------------------------------------------------------------
# RLE
# -----------------------------------------------------------------------------
def test_rle_roundtrip_random():
    rng = np.random.RandomState(0)
    for _ in range(5):
        mask = (rng.rand(23, 31) > 0.6).astype(np.uint8)
        rle = rle_encode(mask)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(rle_decode(rle), mask)


def test_rle_uncompressed_counts():
    # 3x3 mask, column-major runs: [1, 2, 3, 3] -> 0 once, 1 twice, ...
    mask = np.zeros((3, 3), np.uint8)
    flat = mask.T.reshape(-1)
    flat[1:3] = 1
    flat[6:9] = 1
    mask = flat.reshape(3, 3).T
    rle = {"size": [3, 3], "counts": [1, 2, 3, 3]}
    np.testing.assert_array_equal(rle_decode(rle), mask)


def test_polygon_mask_square():
    m = polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert 36 <= m.sum() <= 49  # inclusive-boundary rasterization


# -----------------------------------------------------------------------------
# Heatmap targets
# -----------------------------------------------------------------------------
def _ref_heatmap_generator():
    """Import the reference HWHeatmapGenerator behind dependency shims."""
    for name in ("pycocotools", "pycocotools.mask", "pycocotools.cocoeval",
                 "torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional",
                 "skimage", "skimage.color", "json_tricks", "cv2_stub"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["skimage.color"].rgb2lab = lambda x: x
    sys.modules["skimage.color"].rgb2hsv = lambda x: x
    sys.modules["skimage"].color = sys.modules["skimage.color"]
    sys.modules["torchvision"].transforms = sys.modules[
        "torchvision.transforms"]
    sys.modules["json_tricks"].dump = json.dump
    sys.modules["json_tricks"].load = json.load
    sys.modules["pycocotools.cocoeval"].COCOeval = object
    sys.modules["pycocotools.coco"] = types.ModuleType("pycocotools.coco")
    sys.modules["pycocotools.coco"].COCO = object
    sys.modules["pycocotools"].mask = sys.modules["pycocotools.mask"]
    sys.modules["pycocotools"].cocoeval = sys.modules["pycocotools.cocoeval"]
    add_reference_to_path()
    from rtpe.dataloaders import HWHeatmapGenerator
    return HWHeatmapGenerator


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
@pytest.mark.parametrize("sigma", [2.0, 7.0])
def test_heatmap_generator_matches_reference(sigma):
    HWHeatmapGenerator = _ref_heatmap_generator()
    rng = np.random.RandomState(int(sigma))
    joints = rng.rand(4, 17, 3) * 120 - 10  # some out of bounds
    joints[..., 2] = (rng.rand(4, 17) > 0.3).astype(float)
    ref = HWHeatmapGenerator(17, sigma)(joints, (100, 110))
    ours = HeatmapGenerator(17, sigma)(joints, (100, 110))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("sigma", [2.0, 7.0])
def test_device_render_matches_host(sigma):
    rng = np.random.RandomState(5)
    joints = rng.rand(3, 17, 3) * 90
    joints[..., 2] = (rng.rand(3, 17) > 0.3).astype(float)
    # truncation-toward-zero edge: visible points with a coordinate in
    # (-1, 0) land on row/column 0 via int() in the reference — the
    # device renderer must not floor() them to -1 and drop them
    joints[0, 0] = (-0.4, 10.0, 1.0)
    joints[0, 1] = (12.0, -0.9, 1.0)
    joints[0, 2] = (-1.5, 20.0, 1.0)  # and truly-outside stays dropped
    host = HeatmapGenerator(17, sigma)(joints, (80, 96))  # (J, H, W)
    dev = np.asarray(render_heatmaps(jnp.asarray(joints[None]),
                                     (80, 96), sigma))[0]  # (H, W, J)
    np.testing.assert_allclose(dev.transpose(2, 0, 1), host,
                               rtol=1e-5, atol=1e-6)


# -----------------------------------------------------------------------------
# Synthetic COCO fixture
# -----------------------------------------------------------------------------
def _make_coco_fixture(root, n_imgs=2, hw=(96, 128),
                       jitter_per_image=False):
    import cv2
    h, w = hw
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "images", "val2017"), exist_ok=True)
    rng = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    truth = {}
    for i in range(n_imgs):
        img_id = 1000 + i
        fname = f"{img_id:012d}.jpg"
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "images", "val2017", fname), img)
        images.append({"id": img_id, "file_name": fname,
                       "height": h, "width": w})
        people = []
        for p in range(2):
            # jitter makes each image's GT distinct, so tests that rely
            # on per-image identity (e.g. batched-minival ordering)
            # can't silently pass on constant predictions
            cx = 30 + 60 * p + (6 * i if jitter_per_image else 0)
            cy = 40 + 10 * p + (4 * i if jitter_per_image else 0)
            kps = []
            for j in range(17):
                kps += [cx + (j % 5) * 3, cy + (j // 5) * 4, 2]
            bbox = [cx - 5, cy - 5, 25, 25]
            annotations.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": 17,
                "iscrowd": 0, "area": 625.0, "bbox": bbox,
                "segmentation": [[cx - 5, cy - 5, cx + 20, cy - 5,
                                  cx + 20, cy + 20, cx - 5, cy + 20]],
            })
            people.append(kps)
            aid += 1
        truth[img_id] = people
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "person",
                            "keypoints": ["k"] * 17}]}
    with open(os.path.join(root, "annotations",
                           "person_keypoints_val2017.json"), "w") as f:
        json.dump(data, f)
    return truth


def test_dataset_sample_shapes(tmp_path):
    root = str(tmp_path)
    _make_coco_fixture(root)
    ds = CocoDistillationDataset(root, "val2017", gt_stddevs_pix=[2.0],
                                 alt_colorspace="LAB")
    assert len(ds) == 2
    s = ds[0]
    h, w = s["img"].shape[:2]
    assert s["img"].shape == (96, 128, 3)
    assert s["mask"].shape == (96, 128)
    assert s["mask"].min() == 1.0  # no crowds in fixture
    assert s["hms"][0].shape == (96, 128, 17)
    assert s["hms"][0].max() == pytest.approx(1.0)
    assert s["segm_mask"].shape == (96, 128)
    assert s["segm_mask"].sum() > 0
    assert s["img_alt"].shape == (96, 128, 3)


def test_eval_perfect_predictions_ap1(tmp_path):
    root = str(tmp_path)
    truth = _make_coco_fixture(root)
    ds = CocoDistillationDataset(root, "val2017")
    all_preds, all_scores = [], []
    for img_id in ds.ids:
        people = []
        for kps in truth[img_id]:
            arr = np.asarray(kps, dtype=np.float64).reshape(17, 3)
            arr[:, 2] = 0.9  # score column
            people.append(arr)
        all_preds.append(people)
        all_scores.append([0.9] * len(people))
    stats = ds.evaluate(all_preds, all_scores)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)


def test_eval_missing_person_halves_recall(tmp_path):
    root = str(tmp_path)
    truth = _make_coco_fixture(root)
    ds = CocoDistillationDataset(root, "val2017")
    all_preds, all_scores = [], []
    for img_id in ds.ids:
        kps = truth[img_id][0]  # only first of two people
        arr = np.asarray(kps, dtype=np.float64).reshape(17, 3)
        arr[:, 2] = 0.9
        all_preds.append([arr])
        all_scores.append([0.9])
    stats = ds.evaluate(all_preds, all_scores)
    assert stats["AR"] == pytest.approx(0.5, abs=1e-6)
    assert 0.4 < stats["AP"] <= 0.51


def test_eval_crowd_and_unannotated_are_ignored(tmp_path):
    """Crowd gts and num_keypoints==0 gts must neither count as misses
    nor penalize detections matched to them (COCO protocol)."""
    import json
    root = str(tmp_path)
    truth = _make_coco_fixture(root)
    anno_path = os.path.join(root, "annotations",
                             "person_keypoints_val2017.json")
    with open(anno_path) as f:
        data = json.load(f)
    # add one crowd region and one unannotated person per image
    next_id = max(a["id"] for a in data["annotations"]) + 1
    for im in data["images"]:
        data["annotations"].append({
            "id": next_id, "image_id": im["id"], "category_id": 1,
            "keypoints": [0] * 51, "num_keypoints": 0, "iscrowd": 1,
            "area": 400.0, "bbox": [0, 0, 20, 20],
            "segmentation": {"size": [im["height"], im["width"]],
                             "counts": [im["height"] * im["width"]]},
        })
        next_id += 1
    with open(anno_path, "w") as f:
        json.dump(data, f)

    ds = CocoDistillationDataset(root, "val2017")
    all_preds, all_scores = [], []
    for img_id in ds.ids:
        people = []
        for kps in truth[img_id]:
            arr = np.asarray(kps, dtype=np.float64).reshape(17, 3)
            arr[:, 2] = 0.9
            people.append(arr)
        # an extra detection inside the crowd region: must be ignored,
        # not counted as a false positive
        stray = np.zeros((17, 3))
        stray[:, 0] = 5 + np.arange(17) % 4
        stray[:, 1] = 5 + np.arange(17) // 4
        stray[:, 2] = 0.8
        people.append(stray)
        all_preds.append(people)
        all_scores.append([0.9, 0.9, 0.8])
    stats = ds.evaluate(all_preds, all_scores)
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AR"] == pytest.approx(1.0)


def test_eval_jittered_predictions_degrade(tmp_path):
    root = str(tmp_path)
    truth = _make_coco_fixture(root)
    ds = CocoDistillationDataset(root, "val2017")
    rng = np.random.RandomState(1)
    all_preds, all_scores = [], []
    for img_id in ds.ids:
        people = []
        for kps in truth[img_id]:
            arr = np.asarray(kps, dtype=np.float64).reshape(17, 3)
            arr[:, :2] += rng.randn(17, 2) * 1.5
            arr[:, 2] = 0.9
            people.append(arr)
        all_preds.append(people)
        all_scores.append([0.9] * len(people))
    stats = ds.evaluate(all_preds, all_scores)
    assert 0.0 < stats["AP"] < 1.0


def test_evaluate_rejects_prediction_id_mismatch(tmp_path):
    """AP over a prediction prefix vs the full id list silently counts
    never-evaluated images as misses — evaluate() must reject the
    mismatch and accept an explicit img_ids subset."""
    root = str(tmp_path)
    _make_coco_fixture(root, n_imgs=4, hw=(64, 64))
    ds = CocoDistillationDataset(root, "val2017",
                                 remove_images_without_annotations=True)
    assert len(ds) >= 2
    with pytest.raises(ValueError, match="img_ids"):
        ds.evaluate([[]], [[]])  # 1 prediction, full id list
    stats = ds.evaluate([[]], [[]], img_ids=[ds.ids[0]])
    assert "AP" in stats
