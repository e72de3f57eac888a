"""Row-packed execution transform: op-level exactness + full-model parity.

The rowpack transforms (``ops/rowpack.py``) re-index weights so a
convolution on the (H/2, W, 2C) row-packed layout computes the identical
function as the canonical NHWC conv; these tests assert that exactness
op-by-op, then end-to-end on the W48 teacher against the canonical Flax
model (``models/hrnet.py``) with folded BatchNorm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpe_tpu.ops import rowpack as rp


def _conv(x, w, s, p):
    return jax.lax.conv_general_dilated(
        x, w, s, p, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    np.testing.assert_allclose(rp.d2s_rows(rp.s2d_rows(x)), x)


def test_pack33_pp(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    want = _conv(x, w, (1, 1), ((1, 1), (1, 1)))
    got = rp.d2s_rows(rp.conv_pp(rp.s2d_rows(x), rp.pack33_pp(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pack33_up(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    want = _conv(x, w, (1, 1), ((1, 1), (1, 1)))
    got = rp.d2s_rows(rp.conv_up(x, rp.pack33_up(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pack33s2_pu(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    want = _conv(x, w, (2, 2), ((1, 1), (1, 1)))
    got = rp.conv_pu(rp.s2d_rows(x), rp.pack33s2_pu(w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pack11_pp_with_bias(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 5, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    want = _conv(x, w, (1, 1), ((0, 0), (0, 0))) + b
    got = rp.d2s_rows(
        rp.conv_pp(rp.s2d_rows(x), rp.pack11_pp(w), rp.tile_packed(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _tconv_ref(x, w):
    """TorchConvTranspose math (k=4, s=2, p=1), see models/layers.py."""
    k = jnp.flip(w, axis=(0, 1))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_pack_tconv(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 5, 6).astype(np.float32))
    want = _tconv_ref(x, w)
    got = rp.d2s_rows(
        rp.tconv_pp(rp.s2d_rows(x), rp.pack_tconv4x4s2_pp(w, (5,))))
    assert want.shape == (2, 16, 12, 6)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pack_tconv_split_inputs(rng):
    """The deconv head input is cat(x, heatmaps) of two separately
    packed tensors; the weight transform absorbs the interleave."""
    xa = jnp.asarray(rng.randn(2, 8, 6, 3).astype(np.float32))
    xb = jnp.asarray(rng.randn(2, 8, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 5, 6).astype(np.float32))
    want = _tconv_ref(jnp.concatenate([xa, xb], -1), w)
    xin = jnp.concatenate([rp.s2d_rows(xa), rp.s2d_rows(xb)], -1)
    got = rp.d2s_rows(rp.tconv_pp(xin, rp.pack_tconv4x4s2_pp(w, (3, 2))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("factor", [2, 4, 8])
@pytest.mark.parametrize("packed_out", [True, False])
def test_fuse_up(rng, factor, packed_out):
    """1x1 conv + nearest upsample as one repeat-tconv kernel."""
    from rtpe_tpu.ops.resize import upsample_nearest
    x = jnp.asarray(rng.randn(2, 4, 3, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 5, 4).astype(np.float32))
    want = upsample_nearest(_conv(x, w, (1, 1), ((0, 0), (0, 0))), factor)
    got = rp.apply_fuse_up(x, rp.pack_fuse_up(w, factor, packed_out))
    if packed_out:
        got = rp.d2s_rows(got)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_upsample_into_packed(rng):
    from rtpe_tpu.ops.resize import upsample_nearest
    y = jnp.asarray(rng.randn(2, 4, 3, 5).astype(np.float32))
    for f in (2, 4):
        np.testing.assert_allclose(
            rp.upsample_into_packed(y, f),
            rp.s2d_rows(upsample_nearest(y, f)))


def test_fold_bn(rng):
    x = jnp.asarray(rng.randn(2, 8, 6, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    scale = jnp.asarray(rng.rand(7).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(7).astype(np.float32))
    mean = jnp.asarray(rng.randn(7).astype(np.float32))
    var = jnp.asarray(rng.rand(7).astype(np.float32) + 0.5)
    y = _conv(x, w, (1, 1), ((1, 1), (1, 1)))
    want = (y - mean) * scale / jnp.sqrt(var + 1e-5) + bias
    wf, bf = rp.fold_bn(w, scale, bias, mean, var)
    got = _conv(x, wf, (1, 1), ((1, 1), (1, 1))) + bf
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_w48_packed_forward_parity(rng):
    """Full-model: packed fp32 forward == canonical apply (fp32 noise).

    BN running stats are randomized so the folding is non-trivial.
    """
    import flax

    from rtpe_tpu.models import PoseHigherHRNet, w48_config
    from rtpe_tpu.models.hrnet_packed import (
        pack_w48_params, packed_forward)

    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    v = model.init(key, jnp.zeros((1, 64, 64, 3)), train=False)
    flat = flax.traverse_util.flatten_dict(v["batch_stats"])
    new = {}
    for kk, val in flat.items():
        key, sub = jax.random.split(key)
        new[kk] = (jax.random.normal(sub, val.shape) * 0.1
                   if kk[-1] == "mean"
                   else jnp.abs(jax.random.normal(sub, val.shape)) * 0.5
                   + 0.5)
    v = dict(v)
    v["batch_stats"] = flax.traverse_util.unflatten_dict(new)

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 96, 96, 3))
    coarse, refined = model.apply(v, x, train=False)
    pk = pack_w48_params(v, cfg, dtype=jnp.float32)
    pc, pr = packed_forward(pk, x, cfg, dtype=jnp.float32)
    assert pc.shape == coarse.shape and pr.shape == refined.shape
    for a, b in ((coarse, pc), (refined, pr)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert rel < 1e-4, rel


@pytest.mark.slow
def test_packed_predictor_smoke(rng):
    """PosePredictor(packed=True) runs end-to-end and agrees with the
    canonical predictor on the same random teacher."""
    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.models import PoseHigherHRNet, w48_config

    model = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    img = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
    pred = PosePredictor(model, v, input_size=96, packed=True)
    people, scores = pred.predict(img)
    assert isinstance(people, list) and isinstance(scores, list)


@pytest.mark.slow
def test_w48_int8_quantized_forward(rng):
    """int8 packed path: calibrate on one batch, quantize, and check the
    quantized forward tracks the fp32 packed forward.

    Random-init weights are a *harder* case than trained ones (no
    activation-range structure), so the tolerance here is loose; the
    test pins the machinery (per-channel weight scales, static
    activation scales, s8xs8->s32 conv geometry for every conv kind in
    the graph), not production accuracy — that needs the real
    statedict (TODO.md validation block).
    """
    from rtpe_tpu.models import (
        PoseHigherHRNet,
        calibrate_act_scales,
        pack_w48_params,
        packed_forward,
        quantize_packed,
        w48_config,
    )

    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    pk = pack_w48_params(v, cfg, dtype=jnp.float32)

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 96, 96, 3))
    scales = calibrate_act_scales(pk, [x], cfg, dtype=jnp.float32)
    # one input scale per conv, plus ":out" OUTPUT scales for the
    # fuse-layer convs (their results feed adds, not convs — int8-act
    # stores those operands int8 with their own scale, QConv.inv_sy)
    assert all(name in scales for name in pk)
    out_keys = [k for k in scales if k.endswith(":out")]
    assert out_keys and all(k[:-4] in pk for k in out_keys)
    assert all(s > 0 for s in scales.values())

    fc, fr = packed_forward(pk, x, cfg, dtype=jnp.float32)

    def check(scale_set, int8_act=False):
        pkq = quantize_packed(pk, scale_set)
        qc, qr = packed_forward(pkq, x, cfg, dtype=jnp.float32,
                                int8_act=int8_act)
        assert qc.shape == fc.shape and qr.shape == fr.shape
        worst = 0.0
        for a, b in ((np.asarray(fc), np.asarray(qc)),
                     (np.asarray(fr), np.asarray(qr))):
            assert np.isfinite(b).all()
            denom = max(np.abs(a).max(), 1e-6)
            rel = np.abs(a - b).max() / denom
            # int8 through ~100 sequential convs on random weights
            assert rel < 0.15, rel
            # outputs must be strongly correlated, not just bounded
            corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
            assert corr > 0.99, corr
            worst = max(worst, rel)
        return worst

    err_max = check(scales)

    # percentile-clipped calibration (production default: outliers
    # saturate instead of inflating every scale) must also hold
    scales_p = calibrate_act_scales(pk, [x], cfg, dtype=jnp.float32,
                                    percentile=99.9)
    assert all(scales_p[k] <= scales[k] * (1 + 1e-6) for k in scales)
    err_p = check(scales_p)

    # int8 activation STORAGE (consumer-scale static quantization of
    # every inter-layer tensor) holds the same bounds
    err_a = check(scales, int8_act=True)
    print(f"int8 worst rel err: absmax {err_max:.4f}, p99.9 {err_p:.4f},"
          f" int8_act {err_a:.4f}")


@pytest.mark.slow
def test_int8_decode_level_vs_bf16(rng):
    """Decode-level (people positions/scores) comparison of the bf16
    packed path vs int8 and int8-act on a synthetic peak scene pushed
    through the REAL W48 graph head shapes (VERDICT r2 item 4): the
    quantized paths must find the same number of people with joints
    within a pixel at the heatmap resolution."""
    from rtpe_tpu.decode import HeatmapParser
    from rtpe_tpu.models import (
        PoseHigherHRNet,
        calibrate_act_scales,
        pack_w48_params,
        packed_forward,
        quantize_packed,
        w48_config,
    )

    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    pk = pack_w48_params(v, cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(11), (1, 96, 96, 3))
    scales = calibrate_act_scales(pk, [x], cfg, dtype=jnp.float32)
    pkq = quantize_packed(pk, scales)

    parser = HeatmapParser(num_joints=17, detection_threshold=0.0)

    def peaks(coarse, refined):
        """Decode front end: NMS'd top-k peak values/locations."""
        hms = refined[..., :17].astype(jnp.float32)
        tags = coarse[..., 17:].astype(jnp.float32)
        from rtpe_tpu.ops.resize import resize_bilinear
        tags = resize_bilinear(tags, hms.shape[1:3], align_corners=True)
        val_k, loc_k, _ = parser.top_k(hms, tags)
        return val_k[0], loc_k[0]  # (J, K), (J, K, 2)

    # Grouped PEOPLE on random weights are chaotic (grouping keys on
    # random tag values; rank/cluster identity flips under any ~3%
    # forward perturbation), so the decode-level claim tested here is
    # at the decode's actual input: the NMS'd peak set must survive
    # quantization.  The trained-weight people/AP comparison lives in
    # the real-asset runbook (scripts/validate_assets.py).
    ref_v, ref_l = peaks(*packed_forward(pk, x, cfg, dtype=jnp.float32))
    for label, ia in (("int8", False), ("int8_act", True)):
        got_v, got_l = peaks(*packed_forward(
            pkq, x, cfg, dtype=jnp.float32, int8_act=ia))
        matched = total = 0
        for j in range(ref_l.shape[0]):
            # bf16's strongest 10 peaks per joint, matched against the
            # quantized path's full top-k set
            order = np.argsort(ref_v[j])[::-1][:10]
            for i in order:
                total += 1
                d = np.abs(got_l[j] - ref_l[j, i][None]).max(axis=1)
                if (d <= 2).any():
                    matched += 1
        assert matched / total >= 0.7, (label, matched / total)


@pytest.mark.slow
def test_packed_int8_predictor_smoke(rng):
    """PosePredictor(packed=True, int8=True) runs end-to-end, with and
    without user calibration images."""
    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.models import PoseHigherHRNet, w48_config

    model = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    img = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
    # int8_min_batch=0: this smoke must drive the QUANTIZED program at
    # bs 1 (the default routes small batches through bf16, r5)
    pred = PosePredictor(model, v, input_size=96, packed=True, int8=True,
                         calibration_images=[rng.rand(80, 100, 3)],
                         int8_min_batch=0)
    people, scores = pred.predict(img)
    assert isinstance(people, list) and isinstance(scores, list)

    # int8_act stacks on int8: same API, int8-stored activations
    pred_a = PosePredictor(model, v, input_size=96, packed=True,
                           int8=True, int8_act=True,
                           calibration_images=[rng.rand(80, 100, 3)],
                           int8_min_batch=0)
    people_a, scores_a = pred_a.predict(img)
    assert isinstance(people_a, list) and isinstance(scores_a, list)

    with pytest.raises(ValueError):
        PosePredictor(model, v, input_size=96, int8=True)
    with pytest.raises(ValueError, match="synthetic"):
        # no calibration images and no explicit opt-in (VERDICT r2)
        PosePredictor(model, v, input_size=96, packed=True, int8=True)
    with pytest.raises(ValueError):
        PosePredictor(model, v, input_size=96, packed=True,
                      int8_act=True)


@pytest.mark.slow
def test_predictor_batch_mesh_serving(rng):
    """predict_batch on an 8-device data mesh: sharded forward,
    per-image results equal the single-image path."""
    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.models import PoseHigherHRNet, w48_config
    from rtpe_tpu.parallel import make_mesh

    model = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    mesh = make_mesh(n_data=len(jax.devices()))
    imgs = [(rng.rand(80, 100, 3) * 255).astype(np.uint8)
            for _ in range(3)]  # 3 images over 8 devices: pad path
    pred_m = PosePredictor(model, v, input_size=96, mesh=mesh)
    with mesh:
        batch_out = pred_m.predict_batch(imgs)
    assert len(batch_out) == 3
    pred_1 = PosePredictor(model, v, input_size=96)
    for img, (people, scores) in zip(imgs, batch_out):
        p1, s1 = pred_1.predict(img)
        assert len(people) == len(p1)
        for a, b in zip(people, p1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_predictor_stream_matches_predict(rng):
    """stream() pipelines forward/decode but must yield exactly the
    per-frame results of predict()."""
    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.models import PoseHigherHRNet, w48_config

    model = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    pred = PosePredictor(model, v, input_size=96)
    frames = [(rng.rand(80, 100, 3) * 255).astype(np.uint8)
              for _ in range(3)]
    streamed = list(pred.stream(iter(frames)))
    assert len(streamed) == 3
    for frame, (people, scores) in zip(frames, streamed):
        p1, s1 = pred.predict(frame)
        assert len(people) == len(p1)
        for a, b in zip(people, p1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    # flip-TTA streams through the SAME pipelined path (tta_forward is
    # pure device work, so its dispatch overlaps host grouping exactly
    # like the plain forward) — per-frame results must equal predict()
    pred_f = PosePredictor(model, v, input_size=96, with_flip=True)
    streamed_f = list(pred_f.stream(iter(frames)))
    assert len(streamed_f) == 3
    for frame, (people, scores) in zip(frames, streamed_f):
        p1, s1 = pred_f.predict(frame)
        assert len(people) == len(p1)
        for a, b in zip(people, p1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    # multi-scale TTA also routes through the pipelined stream path
    # (ADVICE r4: the path was live but exercised nowhere) — per-scale
    # compiled shapes, on-device aggregation, same per-frame parity
    pred_ms = PosePredictor(model, v, input_size=96, with_flip=True,
                            scales=(1.0, 0.5))
    streamed_ms = list(pred_ms.stream(iter(frames)))
    assert len(streamed_ms) == 3
    for frame, (people, scores) in zip(frames, streamed_ms):
        p1, s1 = pred_ms.predict(frame)
        assert len(people) == len(p1)
        for a, b in zip(people, p1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_int8_decode_on_trained_weights(tmp_path):
    """int8 accuracy on TRAINED (not random) weights (VERDICT r3
    item 5): fit a reduced-cfg teacher to ideal heatmaps+tags on a
    synthetic fixture (spread joints, wide tag blobs), then hold the
    int8 / int8-act packed paths to the f32 packed path at decode
    level — heatmap closeness, NMS'd peak-set survival, and OKS-AP
    delta.  A 150-step CPU fit cannot reach absolute decode quality
    (the tiny model's tags stay soft), so the claims here are DELTA
    claims — exactly what quantization can break; absolute golden-AP
    validation stays asset-gated (scripts/validate_assets.py)."""
    import json as _json
    import os

    import cv2
    import optax

    from rtpe_tpu.data import CocoDistillationDataset, HeatmapGenerator
    from rtpe_tpu.decode import HeatmapParser
    from rtpe_tpu.models import (
        PoseHigherHRNet,
        calibrate_act_scales,
        pack_w48_params,
        packed_forward,
        quantize_packed,
    )
    from rtpe_tpu.models.hrnet import HRNetConfig, StageCfg
    from rtpe_tpu.ops.resize import resize_bilinear

    root = str(tmp_path)
    h, w = 128, 160
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    os.makedirs(os.path.join(root, "images", "val2017"), exist_ok=True)
    rng0 = np.random.RandomState(0)
    images, annotations = [], []
    aid = 1
    for i in range(2):
        img_id = 1000 + i
        fname = f"{img_id:012d}.jpg"
        cv2.imwrite(os.path.join(root, "images", "val2017", fname),
                    (rng0.rand(h, w, 3) * 255).astype(np.uint8))
        images.append({"id": img_id, "file_name": fname,
                       "height": h, "width": w})
        for p, (ox, oy) in enumerate(((20, 20), (95, 62))):
            kps = []
            for j in range(17):
                kps += [ox + (j % 5) * 10, oy + (j // 5) * 12, 2]
            annotations.append({
                "id": aid, "image_id": img_id, "category_id": 1,
                "keypoints": kps, "num_keypoints": 17, "iscrowd": 0,
                "area": 2600.0, "bbox": [ox - 5, oy - 5, 52, 50],
                "segmentation": [[ox - 5, oy - 5, ox + 45, oy - 5,
                                  ox + 45, oy + 43, ox - 5, oy + 43]],
            })
            aid += 1
    with open(os.path.join(root, "annotations",
                           "person_keypoints_val2017.json"), "w") as f:
        _json.dump({"images": images, "annotations": annotations,
                    "categories": [{"id": 1, "name": "person",
                                    "keypoints": ["k"] * 17}]}, f)
    ds = CocoDistillationDataset(root, "val2017")

    def render(joints, hw_):
        gen = HeatmapGenerator(17, 2.0)
        det = np.transpose(gen(joints, hw_), (1, 2, 0))
        tag = np.zeros((*hw_, 17), np.float32)
        for p, person in enumerate(joints):
            for j in range(17):
                x, y, vis = person[j]
                if vis > 0:
                    xi, yi = int(x), int(y)
                    tag[max(0, yi - 8):yi + 9,
                        max(0, xi - 8):xi + 9, j] = 2.0 * (p + 1)
        return det, tag

    small = HRNetConfig(
        num_joints=17,
        stage2=StageCfg(1, 2, "BASIC", (2, 2), (8, 16)),
        stage3=StageCfg(2, 3, "BASIC", (2, 2, 2), (8, 16, 32)),
        stage4=StageCfg(1, 4, "BASIC", (2, 2, 2, 2), (8, 16, 32, 64)),
        deconv_chans=(17,), deconv_num_blocks=1)
    model = PoseHigherHRNet(cfg=small, dtype=jnp.float32)

    imgs, t_coarse, t_refined = [], [], []
    for i in range(len(ds)):
        s = ds[i]
        det, tag = render(s["joints"], s["mask"].shape)
        x = jnp.asarray(s["img"][None])
        hm4 = resize_bilinear(jnp.asarray(det[None]), (h // 4, w // 4),
                              align_corners=False)
        tg4 = resize_bilinear(jnp.asarray(tag[None]), (h // 4, w // 4),
                              align_corners=False)
        hm2 = resize_bilinear(jnp.asarray(det[None]), (h // 2, w // 2),
                              align_corners=False)
        imgs.append(x)
        t_coarse.append(jnp.concatenate([hm4, tg4], axis=-1))
        t_refined.append(hm2)
    xb = jnp.concatenate(imgs)
    cb = jnp.concatenate(t_coarse)
    rb = jnp.concatenate(t_refined)

    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    tx = optax.adam(3e-3)
    opt = tx.init(v["params"])

    def loss_fn(params, stats):
        (c, r), mut = model.apply(
            {"params": params, "batch_stats": stats}, xb, train=True,
            mutable=["batch_stats"])
        l = (jnp.mean((c[..., :17] - cb[..., :17]) ** 2)
             + 20.0 * jnp.mean((c[..., 17:] - cb[..., 17:]) ** 2)
             + jnp.mean((r - rb) ** 2))
        return l, mut["batch_stats"]

    @jax.jit
    def step(params, stats, opt):
        (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), stats, opt, l

    params, stats = v["params"], v["batch_stats"]
    params, stats, opt, l0 = step(params, stats, opt)
    l0 = float(l0)
    # train to convergence, not to a step count: the 2-image adam fit
    # plateaus at different steps across BLAS stacks, and the absolute
    # loss scales with the (weighted) tag-target coverage — gate on
    # improvement relative to the first step instead
    for it in range(400):
        params, stats, opt, l = step(params, stats, opt)
        if it >= 150 and float(l) < 0.15 * l0:
            break
    assert float(l) < 0.3 * l0, \
        f"fit did not converge: loss {float(l)} vs initial {l0}"

    trained = {"params": params, "batch_stats": stats}
    pk = pack_w48_params(trained, small, dtype=jnp.float32)
    # the trained heatmap head must have real structure for the delta
    # claims below to mean anything
    _, r_chk = packed_forward(pk, imgs[0], small, dtype=jnp.float32)
    assert float(r_chk[..., :17].max()) > 0.5

    scales = calibrate_act_scales(pk, [x for x in imgs], small,
                                  dtype=jnp.float32)
    pkq = quantize_packed(pk, scales)
    parser = HeatmapParser(num_joints=17, max_num_people=30,
                           detection_threshold=0.25)

    def decode_all(pkx, int8_act=False):
        preds, pscores, hm_list, peak_list = [], [], [], []
        for i in range(len(ds)):
            c, r = packed_forward(pkx, imgs[i], small,
                                  dtype=jnp.float32, int8_act=int8_act)
            hms = r[..., :17].astype(jnp.float32)
            tags = resize_bilinear(c[..., 17:].astype(jnp.float32),
                                   hms.shape[1:3], align_corners=True)
            val_k, loc_k, _ = parser.top_k(hms, tags)
            peak_list.append((np.asarray(val_k[0]), np.asarray(loc_k[0])))
            hw_ = ds[i]["mask"].shape
            hms_up = resize_bilinear(hms, hw_, align_corners=True)
            tags_up = resize_bilinear(tags, hw_, align_corners=True)
            grouped, sc = parser.parse_batch(hms_up, tags_up)
            preds.append([p for p in grouped[0]
                          if np.asarray(p).size > 0])
            pscores.append(sc[0])
            hm_list.append(np.asarray(hms))
        return preds, pscores, hm_list, peak_list

    preds_f, sc_f, hm_f, pk_f = decode_all(pk)
    stats_f = ds.evaluate(preds_f, sc_f)
    for label, ia in (("int8", False), ("int8_act", True)):
        preds_q, sc_q, hm_q, pk_q2 = decode_all(pkq, ia)
        stats_q = ds.evaluate(preds_q, sc_q)
        # (1) heatmaps stay bounded on trained structure.  The bounds
        # are loose by design: this 8-16-32-64-channel proxy amplifies
        # per-channel int8 noise far beyond the 48-384-channel W48
        # (fewer channels -> less averaging; 2-image BN stats); the
        # decode-level asserts below are the actual claim
        for a, b in zip(hm_f, hm_q):
            err = np.abs(a - b)
            mx = np.abs(a).max() + 1e-9
            rel, p99 = err.max() / mx, np.percentile(err, 99) / mx
            assert rel <= 0.9 and p99 <= 0.25, (label, rel, p99)
        # (2) the NMS'd peak set survives quantization: bf16-strongest
        # 10 peaks per joint found within 2 px by the quantized path
        for (rv, rl), (qv, ql) in zip(pk_f, pk_q2):
            matched = total = 0
            for j in range(rl.shape[0]):
                order = np.argsort(rv[j])[::-1][:10]
                for i2 in order:
                    total += 1
                    d = np.abs(ql[j] - rl[j, i2][None]).max(axis=1)
                    if (d <= 2).any():
                        matched += 1
            assert matched / total >= 0.8, (label, matched / total)
        # (3) the OKS-AP DELTA is bounded (both paths decode the same
        # trained maps; absolute AP of the 150-step fit is low and not
        # the claim here)
        for key in ("AP", "Ap .5"):
            assert abs(stats_q[key] - stats_f[key]) <= 0.1, (
                label, key, stats_q[key], stats_f[key])


def _tiny_cfg():
    from rtpe_tpu.models import HRNetConfig, StageCfg

    return HRNetConfig(
        num_joints=17,
        stage2=StageCfg(1, 2, "BASIC", (1, 1), (8, 16)),
        stage3=StageCfg(1, 3, "BASIC", (1, 1, 1), (8, 16, 32)),
        stage4=StageCfg(1, 4, "BASIC", (1, 1, 1, 1), (8, 16, 32, 64)),
        deconv_chans=(17,), deconv_num_blocks=1)


def test_act_scales_save_load_roundtrip(tmp_path, rng):
    """Calibration-scale persistence (``save_act_scales`` /
    ``load_act_scales``): the production int8 pattern is calibrate
    once, ship the JSON next to the weights, and quantize every
    serving process from the file — the quantized params must be
    IDENTICAL either way, and a foreign/truncated file must fail
    loudly (the reference has no int8 path; torch PTQ pickles observer
    state inside the model object)."""
    import json

    from rtpe_tpu.models import (
        PoseHigherHRNet,
        calibrate_act_scales,
        load_act_scales,
        pack_w48_params,
        packed_forward,
        quantize_packed,
        save_act_scales,
    )

    cfg = _tiny_cfg()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    pk = pack_w48_params(v, cfg)
    xs = [jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))]
    scales = calibrate_act_scales(pk, xs, cfg)

    path = tmp_path / "act_scales.json"
    save_act_scales(path, scales)
    loaded = load_act_scales(path)
    assert loaded == {k: float(val) for k, val in scales.items()}

    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    c1, r1 = packed_forward(quantize_packed(pk, scales), x, cfg)
    c2, r2 = packed_forward(quantize_packed(pk, loaded), x, cfg)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    # foreign JSON -> loud format error
    bad = tmp_path / "foreign.json"
    bad.write_text(json.dumps({"scales": loaded}))
    with pytest.raises(ValueError, match="not an activation-scale"):
        load_act_scales(bad)
    # truncated scale set -> loud error
    payload = json.loads(path.read_text())
    payload["scales"].popitem()
    trunc = tmp_path / "trunc.json"
    trunc.write_text(json.dumps(payload))
    with pytest.raises(ValueError, match="truncated"):
        load_act_scales(trunc)


def test_predictor_act_scales_file(tmp_path, rng):
    """``PosePredictor(act_scales=<file>)`` skips calibration and
    serves identically to the calibrate-at-init predictor it was saved
    from; a scale file from a different config fails with the
    missing-entries message, and act_scales excludes
    calibration_images."""
    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.models import PoseHigherHRNet, save_act_scales

    cfg = _tiny_cfg()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    img = (rng.rand(80, 100, 3) * 255).astype(np.uint8)

    pred1 = PosePredictor(model, v, input_size=96, packed=True,
                          int8=True, calibration_images=[img])
    assert isinstance(pred1.act_scales, dict) and pred1.act_scales
    path = tmp_path / "scales.json"
    save_act_scales(path, pred1.act_scales)

    pred2 = PosePredictor(model, v, input_size=96, packed=True,
                          int8=True, act_scales=str(path))
    assert pred2.act_scales == {k: float(val) for k, val
                                in pred1.act_scales.items()}
    people1, scores1 = pred1.predict(img)
    people2, scores2 = pred2.predict(img)
    assert len(people1) == len(people2)
    for a, b in zip(people1, people2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a scale set missing conv entries names the gap
    partial = dict(list(pred1.act_scales.items())[:3])
    with pytest.raises(ValueError, match="missing"):
        PosePredictor(model, v, input_size=96, packed=True, int8=True,
                      act_scales=partial)
    with pytest.raises(ValueError, match="mutually exclusive"):
        PosePredictor(model, v, input_size=96, packed=True, int8=True,
                      act_scales=partial, calibration_images=[img])
