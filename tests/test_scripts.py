"""CLI smoke drives for the entry scripts (subprocess, CPU, tiny sizes).

The six entry points are the reference's user-facing contracts
(SURVEY.md §2.1); until round 2 they were only driven manually.  Each
test runs the real script in a subprocess on a synthetic COCO fixture
with sizes small enough for CPU compiles, asserting the end-to-end
artifact (stats dict, npz corpus, snapshot parts, PNGs) — not just
rc=0.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Each drive pays a fresh jax import + CPU compile in a subprocess
# (~2-4 min each), too slow for the default suite — run with
# ``make test-cli`` (RTPE_CLI_TESTS=1).
pytestmark = pytest.mark.skipif(
    not os.environ.get("RTPE_CLI_TESTS"),
    reason="CLI subprocess drives are slow; set RTPE_CLI_TESTS=1 "
           "(make test-cli)")


@pytest.fixture(scope="module")
def cli_coco(tmp_path_factory):
    """Tiny COCO + teacher-npz fixture (4 images, 96x128)."""
    import cv2

    from rtpe_tpu.data.teacher_cache import save_teacher_prediction

    root = str(tmp_path_factory.mktemp("cli_coco"))
    os.makedirs(os.path.join(root, "annotations"))
    os.makedirs(os.path.join(root, "images", "val2017"))
    os.makedirs(os.path.join(root, "teacher"))
    rng = np.random.RandomState(0)
    h, w = 96, 128
    yy, xx = np.mgrid[0:h // 2, 0:w // 2]
    images, annotations = [], []
    aid = 1
    for i in range(4):
        img_id = 1000 + i
        fname = f"{img_id:012d}.jpg"
        cv2.imwrite(os.path.join(root, "images", "val2017", fname),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
        images.append({"id": img_id, "file_name": fname,
                       "height": h, "width": w})
        for _ in range(2):
            cx, cy = rng.randint(20, w - 30), rng.randint(20, h - 30)
            kps = []
            for j in range(17):
                kps += [int(cx + (j % 5) * 2), int(cy + (j // 5) * 2), 2]
            annotations.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": 17, "iscrowd": 0,
                "area": 144.0, "bbox": [cx - 3, cy - 3, 14, 12],
                "segmentation": [[cx - 3, cy - 3, cx + 11, cy - 3,
                                  cx + 11, cy + 9, cx - 3, cy + 9]]})
            aid += 1
        refined = np.zeros((h // 2, w // 2, 17), np.float32)
        for j in range(17):
            cx2 = rng.randint(10, w // 2 - 10)
            cy2 = rng.randint(10, h // 2 - 10)
            refined[:, :, j] = np.exp(
                -((xx - cx2) ** 2 + (yy - cy2) ** 2) / 20.0)
        coarse = np.concatenate(
            [refined[::2, ::2],
             np.zeros((h // 4, w // 4, 17), np.float32)], axis=-1)
        save_teacher_prediction(os.path.join(root, "teacher"), fname,
                                coarse, refined)
    with open(os.path.join(root, "annotations",
                           "person_keypoints_val2017.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "person",
                                   "keypoints": ["k"] * 17}]}, f)
    return root


def _run(script, args, timeout=600):
    env = dict(os.environ)
    # JAX_PLATFORMS alone is NOT enough: the environment's sitecustomize
    # imports jax at interpreter startup with the TPU platform pinned;
    # rtpe_tpu honors RTPE_PLATFORM via the config API instead
    env["JAX_PLATFORMS"] = "cpu"
    env["RTPE_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no 8-device emulation: faster compiles
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script)] + args,
        env=env, cwd=REPO, capture_output=True, text=True,
        timeout=timeout)
    if res.returncode != 0:
        raise AssertionError(
            f"{script} rc={res.returncode}\n--- stdout:\n"
            f"{res.stdout[-1500:]}\n--- stderr:\n{res.stderr[-3000:]}")
    return res


def test_validate_hhrnet_cli(cli_coco, tmp_path):
    res = _run("validate_hhrnet.py", [
        "--coco_dir", cli_coco, "-m", "/nonexistent",
        "--allow_random_init",
        "--input_size", "128", "--max_images", "3",
        "--save_every", "2", "--save_dir", str(tmp_path),
        "--batch_size", "2"])
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert set(stats) >= {"AP", "AR", "Ap .5"}
    assert any(f.startswith("validate_hhrnet_") for f in
               os.listdir(tmp_path))


def test_teacher_inference_cli(cli_coco, tmp_path):
    imgs = sorted(
        os.path.join(cli_coco, "images", "val2017", f)
        for f in os.listdir(os.path.join(cli_coco, "images", "val2017")))
    out = str(tmp_path / "corpus")
    _run("teacher_inference.py",
         ["-I"] + imgs[:2] + ["-o", out, "-m", "/nonexistent",
                              "--allow_random_init",
                              "--input_size", "64", "-b", "2"])
    files = sorted(os.listdir(out))
    assert len(files) == 2 and files[0].endswith("_w48_predictions.npz")
    with np.load(os.path.join(out, files[0])) as z:
        # the reference's npz key contract (teacher_inference.py)
        assert {"pred_heatmaps", "embeddings", "heatmaps_refined",
                "heatmaps_order"} <= set(z.keys())


def test_distillation_cli_and_eval_attention_cli(cli_coco, tmp_path):
    snaps = str(tmp_path / "snaps")
    _run("distillation.py", [
        "--coco_dir", cli_coco, "--teacher_dir",
        os.path.join(cli_coco, "teacher"),
        "--model_path", "/nonexistent",
        "--inplanes", "8", "--batch_size", "2", "--train_hw", "64", "64",
        "--canvas_hw", "96", "128", "--max_steps", "2",
        "--num_epochs", "1", "--snapshot_dir", snaps,
        "--log_dir", str(tmp_path / "log"),
        "--tb_dir", str(tmp_path / "tb"),
        "--diagnose_every", "0", "--num_workers", "1"], timeout=900)
    suffix = "mid_stem.statedict.npz"
    marker = [f for f in os.listdir(snaps) if f.endswith(suffix)]
    assert marker, os.listdir(snaps)
    # reference part naming: {timestamp}_epoch{E}_step{S}{part}
    prefix = marker[0][: -len(suffix)]
    ts, epoch_step = prefix.rsplit("_epoch", 1)
    epoch, step = epoch_step.split("_step")

    res = _run("eval_attention.py", [
        "--coco_dir", cli_coco, "--snapshot_dir", snaps,
        "--load_timestamp", ts, "--load_epoch", epoch,
        "--load_step", step, "--model_path", "/nonexistent",
        "--inplanes", "8", "--max_images", "2", "--save_every", "1",
        "--save_dir", str(tmp_path / "att"),
        "--tb_dir", str(tmp_path / "att_tb")])
    assert "mean attention loss" in res.stdout + res.stderr
    assert any(f.startswith("attention_")
               for f in os.listdir(tmp_path / "att"))


def test_teacher_inference_packed_matches_canonical(cli_coco, tmp_path):
    """The corpus job's default (packed) path must write npz files that
    agree with the canonical parity surface (VERDICT r2 item 1)."""
    imgs = sorted(
        os.path.join(cli_coco, "images", "val2017", f)
        for f in os.listdir(os.path.join(cli_coco, "images", "val2017")))
    out_c = str(tmp_path / "canon")
    out_p = str(tmp_path / "packed")
    common = ["-I"] + imgs[:2] + ["-m", "/nonexistent",
                                  "--allow_random_init",
                                  "--input_size", "64", "-b", "2"]
    _run("teacher_inference.py", common + ["-o", out_c, "--no-packed"])
    _run("teacher_inference.py", common + ["-o", out_p])  # packed default
    files = sorted(os.listdir(out_c))
    assert files == sorted(os.listdir(out_p))
    for f in files:
        with np.load(os.path.join(out_c, f)) as zc, \
                np.load(os.path.join(out_p, f)) as zp:
            assert set(zc.keys()) == set(zp.keys())
            for k in ("pred_heatmaps", "embeddings", "heatmaps_refined"):
                a, b = zc[k], zp[k]
                assert a.shape == b.shape, (k, a.shape, b.shape)
                denom = np.linalg.norm(a) + 1e-12
                rel = np.linalg.norm(a - b) / denom
                # bf16 tolerance: the packed path folds BN into bf16
                # weights while the canonical path keeps fp32 BN, so
                # ~1% relative-norm drift through ~100 layers is the
                # expected bf16 rounding budget (the exact-math parity
                # is asserted at fp32 in tests/test_rowpack.py)
                assert rel < 0.02, (k, rel)


def test_teacher_inference_missing_model_hard_fails(cli_coco, tmp_path):
    """Without --allow_random_init, a bad model path must NOT silently
    produce a noise corpus (ADVICE r2, medium)."""
    imgs = sorted(
        os.path.join(cli_coco, "images", "val2017", f)
        for f in os.listdir(os.path.join(cli_coco, "images", "val2017")))
    out = str(tmp_path / "corpus")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["RTPE_PLATFORM"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "teacher_inference.py"),
         "-I", imgs[0], "-o", out, "-m", "/nonexistent",
         "--input_size", "64"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=300)
    assert res.returncode == 2, (res.returncode, res.stderr[-500:])
    assert not os.path.exists(out) or not os.listdir(out)


def test_validate_assets_runbook(tmp_path):
    """The real-asset runbook's runnable steps work end-to-end on a
    real-format (random-weight) statedict: param-count + forward
    finiteness + packed/int8 parity PASS, everything COCO-gated SKIPs
    (VERDICT r2 item 10)."""
    import conftest
    if not conftest.has_reference():
        pytest.skip("reference repo not mounted")
    conftest.add_reference_to_path()
    import torch

    from rtpe.third_party.pose_higher_hrnet import \
        PoseHigherResolutionNet

    torch.manual_seed(0)
    tm = PoseHigherResolutionNet()
    sd_path = str(tmp_path / "w48_random.pth.tar")
    torch.save(tm.state_dict(), sd_path)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["RTPE_PLATFORM"] = "cpu"
    res = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "validate_assets.py"),
         "-m", sd_path, "--coco_dir", "/nonexistent"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500)
    assert res.returncode == 0, res.stdout[-800:] + res.stderr[-800:]
    report = json.loads(res.stdout.strip().splitlines()[-1])
    assert "teacher_param_count" in report["passed"], report
    assert "teacher_forward_finite" in report["passed"], report
    assert "packed_fp32_parity" in report["passed"], report
    assert not report["failed"], report


def test_dataloader_demo_cli(cli_coco, tmp_path):
    res = _run("dataloader_demo.py", [
        "--coco_dir", cli_coco,
        "--teacher_dir", os.path.join(cli_coco, "teacher"),
        "--num_demo_batches", "1", "--max_eval_images", "2",
        "--save_dir", str(tmp_path)])
    out = res.stdout + res.stderr
    assert "AP" in out


@pytest.mark.parametrize("flip", [False, True])
def test_realtime_demo_cli(cli_coco, tmp_path, flip):
    """Streamed frames -> one JSON stats line + annotated dumps.

    The flip variant drives the pipelined flip-TTA stream (tta_forward
    dispatched async per frame) through the same CLI contract."""
    img_dir = os.path.join(cli_coco, "images", "val2017")
    frames = [os.path.join(img_dir, f)
              for f in sorted(os.listdir(img_dir))][:3]
    out_dir = str(tmp_path / "annotated")
    res = _run("realtime_demo.py", [
        "-I", *frames, "-m", str(tmp_path / "absent.pth"),
        "--allow_random_init", "--loops", "2", "--input_size", "128",
        "-o", out_dir, "--save_frames", "2",
        *(["--flip"] if flip else [])])
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["frames"] == 6
    assert stats["path"] == "packed"
    assert stats["lat_p50_ms"] > 0 and stats["fps_sustained"] > 0
    # first frame carries the compile; steady-state must exclude it
    assert stats["first_frame_ms"] > stats["lat_p50_ms"]
    assert sorted(os.listdir(out_dir)) == ["frame00000.png",
                                           "frame00001.png"]


def test_export_serving_cli(cli_coco, tmp_path):
    """Artifact export drive: writes the directory, self-verifies the
    reload bit-parity, and the artifact reconstructs a predictor with
    an int8 scale set calibrated on the given images."""
    img_dir = os.path.join(cli_coco, "images", "val2017")
    calib = [os.path.join(img_dir, f)
             for f in sorted(os.listdir(img_dir))][:2]
    art = str(tmp_path / "artifact")
    res = _run("export_serving.py", [
        "-m", str(tmp_path / "absent.pth"), "--allow_random_init",
        "-o", art, "--input_size", "128",
        "--int8", "--calib", *calib])
    stats = json.loads(res.stdout.strip().splitlines()[-1])
    assert stats["verified"] and stats["int8"]
    assert sorted(os.listdir(art)) == ["act_scales.json", "meta.json",
                                       "weights.npz"]
    from rtpe_tpu.eval.predictor import PosePredictor
    pred = PosePredictor.from_artifact(art, fused_decode=False)
    assert pred.act_scales and pred.input_size == 128
