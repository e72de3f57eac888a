"""Serving artifact (io/serving.py): export -> load -> serve parity.

The artifact must reconstruct the EXACT serving process — BN fold,
row-packing, and int8 quantization replay deterministically from the
shipped weights + scales, so a fleet process built from the directory
is bit-identical to the exporting process.  (The reference has no
deployment format at all: every script re-assembles statedict path +
config by hand, ``validate_hhrnet.py:84-110``.)
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpe_tpu.eval.predictor import PosePredictor
from rtpe_tpu.io import export_serving_artifact, load_serving_artifact
from rtpe_tpu.models import HRNetConfig, PoseHigherHRNet, StageCfg


def _small_cfg():
    return HRNetConfig(
        num_joints=17,
        stage2=StageCfg(1, 2, "BASIC", (1, 1), (8, 16)),
        stage3=StageCfg(1, 3, "BASIC", (1, 1, 1), (8, 16, 32)),
        stage4=StageCfg(1, 4, "BASIC", (1, 1, 1, 1), (8, 16, 32, 64)),
        deconv_chans=(8,), deconv_num_blocks=1)


def _model_vars(cfg):
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


def _img(seed=0, hw=(100, 140)):
    return (np.random.RandomState(seed).rand(*hw, 3) * 255
            ).astype(np.uint8)


def _assert_same_serving(a: PosePredictor, b: PosePredictor):
    """Bit-identical forward + identical decoded people."""
    x = jnp.asarray(np.random.RandomState(1).rand(1, 128, 128, 3)
                    .astype(np.float32))
    ca, ra = a._fwd(x)
    cb, rb = b._fwd(x)
    np.testing.assert_array_equal(np.asarray(ca, np.float32),
                                  np.asarray(cb, np.float32))
    np.testing.assert_array_equal(np.asarray(ra, np.float32),
                                  np.asarray(rb, np.float32))
    img = _img()
    pa, sa = a.predict(img)
    pb, sb = b.predict(img)
    assert len(pa) == len(pb) and list(sa) == list(sb)
    for qa, qb in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))


def test_artifact_roundtrip_packed(tmp_path):
    cfg = _small_cfg()
    model, variables = _model_vars(cfg)
    pred = PosePredictor(model, variables, input_size=128, packed=True,
                         fused_decode=False)
    d = export_serving_artifact(str(tmp_path / "art"), variables, cfg,
                                input_size=128, packed=True)
    loaded = PosePredictor.from_artifact(d, fused_decode=False)
    assert loaded.input_size == 128
    _assert_same_serving(pred, loaded)


def test_artifact_roundtrip_int8_act(tmp_path):
    cfg = _small_cfg()
    model, variables = _model_vars(cfg)
    calib = [_img(7, (96, 96)), _img(8, (96, 96))]
    pred = PosePredictor(model, variables, input_size=128, packed=True,
                         int8=True, int8_act=True,
                         calibration_images=calib, fused_decode=False)
    d = export_serving_artifact(str(tmp_path / "art"), variables, cfg,
                                input_size=128, packed=True, int8=True,
                                int8_act=True,
                                act_scales=pred.act_scales)
    loaded = PosePredictor.from_artifact(d, fused_decode=False)
    # scales replay exactly -> identical quantized weights -> identical
    # int8 serving numerics, with no calibration corpus at load time
    assert loaded.act_scales == pred.act_scales
    _assert_same_serving(pred, loaded)


def test_artifact_override_int8_off(tmp_path):
    """Overrides win: the same int8 artifact can serve bf16."""
    cfg = _small_cfg()
    model, variables = _model_vars(cfg)
    calib = [_img(7, (96, 96))]
    pred = PosePredictor(model, variables, input_size=128, packed=True,
                         int8=True, calibration_images=calib,
                         fused_decode=False)
    d = export_serving_artifact(str(tmp_path / "art"), variables, cfg,
                                input_size=128, packed=True, int8=True,
                                act_scales=pred.act_scales)
    bf16 = PosePredictor.from_artifact(d, int8=False, int8_act=False,
                                       fused_decode=False)
    ref = PosePredictor(model, variables, input_size=128, packed=True,
                        fused_decode=False)
    _assert_same_serving(ref, bf16)


def test_int8_small_batch_routes_bf16():
    """VERDICT r4 item 6: int8/int8-act serving auto-routes batches
    below ``int8_min_batch`` through the bf16 packed program (at bs 1
    the quantized program measured SLOWER — 31.5 vs 22.4 ms — and
    realtime single-stream is the regime where that matters).  Routed
    calls must return bf16-exact numerics; ``int8_min_batch=0``
    disables routing."""
    cfg = _small_cfg()
    model, variables = _model_vars(cfg)
    calib = [_img(7, (96, 96))]
    pred = PosePredictor(model, variables, input_size=128, packed=True,
                         int8=True, calibration_images=calib,
                         fused_decode=False)
    bf16 = PosePredictor(model, variables, input_size=128, packed=True,
                         fused_decode=False)
    # program selection honors the threshold
    assert pred.int8_min_batch >= 1  # measured default, not 0
    assert pred._route_fwd(1) is pred._fwd_bf16
    assert pred._route_fwd(pred.int8_min_batch) is pred._fwd
    # a routed bs-1 predict equals the pure-bf16 predictor exactly
    img = _img()
    pa, sa = pred.predict(img)
    pb, sb = bf16.predict(img)
    assert len(pa) == len(pb) and list(sa) == list(sb)
    for qa, qb in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
    # pinning 0 serves every batch quantized (no bf16 program at all
    # is built lazily -> routing returns the quantized program)
    pinned = PosePredictor(model, variables, input_size=128,
                           packed=True, int8=True,
                           calibration_images=calib,
                           fused_decode=False, int8_min_batch=0)
    assert pinned._route_fwd(1) is pinned._fwd
    # bf16 predictors have no routing (nothing to route to)
    assert bf16._route_fwd(1) is bf16._fwd


def test_int8_export_requires_scales(tmp_path):
    cfg = _small_cfg()
    _, variables = _model_vars(cfg)
    with pytest.raises(ValueError, match="act_scales"):
        export_serving_artifact(str(tmp_path / "art"), variables, cfg,
                                int8=True)
    with pytest.raises(ValueError, match="int8"):
        export_serving_artifact(str(tmp_path / "art2"), variables, cfg,
                                act_scales={"x": 1.0})


def test_load_validates_integrity(tmp_path):
    cfg = _small_cfg()
    _, variables = _model_vars(cfg)
    d = export_serving_artifact(str(tmp_path / "art"), variables, cfg)

    # cfg survives the json round trip exactly
    assert load_serving_artifact(d).cfg == cfg

    # corrupt weights -> sha256 mismatch, loud
    wpath = os.path.join(d, "weights.npz")
    blob = bytearray(open(wpath, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(wpath, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="sha256"):
        load_serving_artifact(d)

    # foreign meta -> format error; missing dir -> FileNotFoundError
    meta = json.load(open(os.path.join(d, "meta.json")))
    meta["format"] = "something-else"
    json.dump(meta, open(os.path.join(d, "meta.json"), "w"))
    with pytest.raises(ValueError, match="format"):
        load_serving_artifact(d)
    with pytest.raises(FileNotFoundError):
        load_serving_artifact(str(tmp_path / "nope"))


def test_artifact_bf16_variables_widen_exactly(tmp_path):
    """bf16 variable leaves are stored widened to f32 (npz has no
    portable bf16); the packed path re-rounds at load, so serving is
    still bit-identical to exporting the bf16 tree directly."""
    cfg = _small_cfg()
    model, variables = _model_vars(cfg)
    bf = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32
        else a, variables)
    d = export_serving_artifact(str(tmp_path / "art"), bf, cfg,
                                input_size=128, packed=True)
    art = load_serving_artifact(d)
    leaf = jax.tree_util.tree_leaves(art.variables)[0]
    assert np.asarray(leaf).dtype == np.float32
    a = PosePredictor(model, bf, input_size=128, packed=True,
                      fused_decode=False)
    b = PosePredictor.from_artifact(d, fused_decode=False)
    _assert_same_serving(a, b)
