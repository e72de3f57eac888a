"""Pipeline, checkpointing, legacy train steps, profiling, debug."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_data_eval import _make_coco_fixture

from rtpe_tpu.data import CocoDistillationDataset
from rtpe_tpu.data.pipeline import TrainPipeline


def test_pipeline_batch_shapes_and_geometry(tmp_path):
    root = str(tmp_path)
    _make_coco_fixture(root, n_imgs=4, hw=(96, 128))
    ds = CocoDistillationDataset(root, "val2017",
                                 remove_images_without_annotations=True,
                                 gt_stddevs_pix=[2.0])
    pipe = TrainPipeline(ds, batch_size=2, out_hw=(64, 64), sigma=2.0,
                         canvas_hw=(128, 160), seed=0)
    batches = list(pipe)
    assert len(batches) == 2
    b = batches[0]
    assert b["img"].shape == (2, 64, 64, 3)
    assert b["img_alt"].shape == (2, 64, 64, 3)
    assert b["gt_hms"].shape == (2, 64, 64, 17)
    assert b["teacher_hms"].shape == (2, 64, 64, 17)
    assert b["mask"].shape == (2, 64, 64, 1)
    # geometry coherence: wherever the gt heatmap has mass, the segm
    # mask (same warp) must also have mass nearby — both planes went
    # through the same affine matrix
    hm = np.asarray(b["gt_hms"]).max(axis=-1)
    seg = np.asarray(b["segm_mask"])[..., 0]
    for i in range(2):
        if hm[i].max() > 0.5:
            ys, xs = np.where(hm[i] > 0.5)
            # dilate segm a bit and check overlap
            from scipy.ndimage import binary_dilation
            seg_d = binary_dilation(seg[i] > 0.5, iterations=6)
            frac = seg_d[ys, xs].mean()
            assert frac > 0.6, f"sample {i}: heatmaps not aligned to segm"


def test_pipeline_compact_transfer_matches_full(tmp_path):
    """Compact host->device transfer (uint8 images/masks, f16 teacher
    maps) must reproduce the full-precision stream: images to a ulp
    (the uint8/255 round-trip is value-exact; XLA lowers the on-device
    /255 as a reciprocal multiply, so the last bit can differ from the
    host's division), teacher maps to f16 quantization."""
    root = str(tmp_path)
    _make_coco_fixture(root, n_imgs=2, hw=(96, 128))
    ds = CocoDistillationDataset(root, "val2017",
                                 remove_images_without_annotations=True)

    def run(compact):
        pipe = TrainPipeline(ds, batch_size=2, out_hw=(48, 48),
                             canvas_hw=(128, 160), seed=3,
                             compact_transfer=compact)
        return {k: np.asarray(v) for k, v in next(iter(pipe)).items()}

    a, b = run(True), run(False)
    assert set(a) == set(b)
    np.testing.assert_allclose(a["img"], b["img"], atol=1e-5)
    np.testing.assert_allclose(a["img_alt"], b["img_alt"],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(a["mask"], b["mask"])
    np.testing.assert_array_equal(a["segm_mask"], b["segm_mask"])
    np.testing.assert_array_equal(a["gt_hms"], b["gt_hms"])
    np.testing.assert_allclose(a["teacher_hms"], b["teacher_hms"],
                               atol=2e-3)
    np.testing.assert_allclose(a["teacher_ae"], b["teacher_ae"],
                               rtol=2e-3, atol=2e-3)


def test_pipeline_deterministic_with_seed(tmp_path):
    root = str(tmp_path)
    _make_coco_fixture(root, n_imgs=2, hw=(96, 128))
    ds = CocoDistillationDataset(root, "val2017",
                                 remove_images_without_annotations=True)
    def run(seed):
        pipe = TrainPipeline(ds, batch_size=2, out_hw=(48, 48),
                             canvas_hw=(128, 160), seed=seed)
        return np.asarray(next(iter(pipe))["img"])
    a, b, c = run(1), run(1), run(2)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # different seed, different warp


def test_checkpoint_roundtrip_and_resume(tmp_path):
    from rtpe_tpu.io.checkpoint import TrainCheckpointer
    from rtpe_tpu.models import AttentionStudentSteps
    from rtpe_tpu.train import DistillConfig, DistillTrainState

    model = AttentionStudentSteps(inplanes=8, num_heatmaps=5, ae_dims=0,
                                  alt_planes=6, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    cfg = DistillConfig()
    state = DistillTrainState.create(variables, cfg)
    state = state.replace(step=jnp.int32(7))

    ck = TrainCheckpointer(str(tmp_path / "ck"), max_to_keep=2)
    assert ck.latest_step() is None
    ck.save(7, jax.device_get(state))
    assert ck.latest_step() == 7

    fresh = DistillTrainState.create(variables, cfg)
    restored, step = ck.restore(jax.device_get(fresh))
    assert step == 7
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_student_parts_roundtrip(tmp_path):
    from rtpe_tpu.io.checkpoint import (
        load_student_parts,
        save_student_parts,
    )
    from rtpe_tpu.models import AttentionStudentSteps

    model = AttentionStudentSteps(inplanes=8, num_heatmaps=5, ae_dims=0,
                                  alt_planes=6, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v1 = model.init(jax.random.PRNGKey(1), x, x, train=False)
    v2 = model.init(jax.random.PRNGKey(2), x, x, train=False)

    files = save_student_parts(jax.device_get(v1), str(tmp_path), "snap_")
    assert len(files) == 7  # reference part granularity
    merged = load_student_parts(jax.device_get(v2), str(tmp_path),
                                "snap_")
    # the att_top part must now equal v1, stem must stay v2
    a1 = np.asarray(v1["params"]["att_top"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["att_top"]["kernel"]), a1)
    s2 = np.asarray(v2["params"]["stem"]["conv1"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["stem"]["conv1"]["kernel"]), s2)


def test_legacy_student_step_trains():
    from rtpe_tpu.models import CamStudent
    from rtpe_tpu.train.legacy_steps import (
        StudentDistillConfig,
        StudentTrainState,
        make_student_train_step,
    )

    model = CamStudent(inplanes=8, num_stages=2, num_heatmaps=5,
                       ae_dims=1, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    cfg = StudentDistillConfig(background_factor=0.01)
    state = StudentTrainState.create(variables, cfg)
    step = make_student_train_step(model, cfg, out_hw=(64, 64))

    rng = np.random.RandomState(0)
    batch = {
        "img": rng.rand(2, 64, 64, 3).astype(np.float32),
        "gt_hms": (rng.rand(2, 64, 64, 6) > 0.9).astype(np.float32),
        "teacher_hms": rng.rand(2, 64, 64, 6).astype(np.float32),
        "mask": np.ones((2, 64, 64, 1), np.float32),
    }
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # stem stays frozen
    stem_k0 = np.asarray(variables["params"]["stem"]["conv1"]["kernel"])
    stem_k1 = np.asarray(state.params["stem"]["conv1"]["kernel"])
    np.testing.assert_array_equal(stem_k0, stem_k1)


def test_profiling_helpers():
    from rtpe_tpu.obs.profiling import flops_of, memory_analysis, timeit

    f = jax.jit(lambda a, b: a @ b)
    x = jnp.ones((128, 128))
    stats = timeit(f, x, x, warmup=1, iters=3)
    assert stats["p50"] > 0
    flops = flops_of(f, x, x)
    assert flops is None or flops >= 2 * 128 ** 3 * 0.9
    mem = memory_analysis(f, x, x)
    assert mem is None or mem["output_bytes"] >= 128 * 128 * 4


def test_compile_watchdog_pokes_on_stall(tmp_path):
    import sys
    import time

    from rtpe_tpu.utils.watchdog import compile_watchdog

    marker = tmp_path / "poked"
    poke = [sys.executable, "-c",
            f"open({str(marker)!r}, 'w').write('x')"]
    with compile_watchdog(interval=0.3, max_pokes=2,
                          poke_argv=poke) as wd:
        time.sleep(2.0)  # simulate a stalled first compile
    # generous deadline: the poke is a subprocess spawn, which can lag
    # many seconds on a loaded CI box
    deadline = time.time() + 30
    while not marker.exists() and time.time() < deadline:
        time.sleep(0.1)
    assert marker.exists()
    assert 1 <= wd.pokes <= 2

    # progress marks keep it quiet
    marker2 = tmp_path / "poked2"
    poke2 = [sys.executable, "-c",
             f"open({str(marker2)!r}, 'w').write('x')"]
    with compile_watchdog(interval=0.5, max_pokes=2,
                          poke_argv=poke2) as wd:
        for _ in range(4):
            time.sleep(0.2)
            wd.alive()
    assert not marker2.exists()
    assert wd.pokes == 0


def test_nan_debugging_context():
    from rtpe_tpu.utils.debug import assert_all_finite, nan_debugging

    with pytest.raises(FloatingPointError):
        assert_all_finite({"a": np.array([1.0, np.nan])})
    assert_all_finite({"a": np.ones(3)})

    with nan_debugging():
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.zeros(2) - 1.0).block_until_ready()
    # restored afterwards
    jnp.log(jnp.zeros(2) - 1.0).block_until_ready()


def test_native_rle_matches_python(tmp_path):
    from rtpe_tpu.data.rle import (
        decode_rle_counts,
        encode_rle_counts,
        rle_decode,
        rle_encode,
    )
    from rtpe_tpu.native import build, native_rle_decode

    assert build()
    rng = np.random.RandomState(0)
    for _ in range(4):
        m = (rng.rand(41, 61) > 0.55).astype(np.uint8)
        r = rle_encode(m)
        native = native_rle_decode(r["counts"].encode("ascii"), 41, 61)
        assert native is not None
        np.testing.assert_array_equal(native, m)
        np.testing.assert_array_equal(rle_decode(r), m)
