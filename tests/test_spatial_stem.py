"""Spatial (context-parallel analog) sharding through a real model
stage: the W48 stem at >1k px, H-sharded over the mesh ``model`` axis,
must equal the unsharded canonical forward exactly (VERDICT r1 item 10;
SURVEY.md §5.7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpe_tpu.models import PoseHigherHRNet, w48_config
from rtpe_tpu.parallel import make_mesh
from rtpe_tpu.parallel.spatial import halo_conv, sharded_stem_apply, \
    shard_spatial


def _canonical_stem(variables, x):
    """Unsharded reference: the exact ops of PoseHigherHRNet's stem
    (fp32, eval BN)."""
    p, s = variables["params"], variables["batch_stats"]
    x = x.astype(jnp.float32)
    for conv_name, bn_name in (("conv1", "bn1"), ("conv2", "bn2")):
        x = jax.lax.conv_general_dilated(
            x, p[conv_name]["kernel"].astype(jnp.float32), (2, 2),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        bn_p, bn_s = p[bn_name], s[bn_name]
        g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
        x = jax.nn.relu((x - bn_s["mean"]) * g + bn_p["bias"])
    return x


@pytest.mark.slow
def test_sharded_stem_equals_unsharded_at_1k_px():
    mesh = make_mesh(n_data=2, n_model=4)
    model = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1024, 128, 3))

    want = _canonical_stem(v, x)
    got = sharded_stem_apply(v, x, mesh, "model")
    assert got.shape == (1, 256, 32, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # the result is genuinely H-sharded 4 ways over the model axis
    shard_h = got.addressable_shards[0].data.shape[1]
    assert shard_h == 256 // 4, shard_h


def test_canonical_stem_matches_flax_model():
    """The test's reference stem is the model's actual stem: compare
    against the flax module's captured bn2 intermediate."""
    model = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    _, inter = model.apply(
        v, x, train=False, capture_intermediates=True, mutable=["intermediates"])
    bn2_out = inter["intermediates"]["bn2"]["__call__"][0]
    want = jax.nn.relu(bn2_out.astype(jnp.float32))
    got = _canonical_stem(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_halo_conv_stride2_matches_dense():
    mesh = make_mesh(n_data=2, n_model=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 24, 6).astype(np.float32))
    k = jnp.asarray(rng.rand(3, 3, 6, 8).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = halo_conv(shard_spatial(x, mesh, "model"), k, mesh, "model",
                    stride=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _full_forward_setup():
    from jax.sharding import Mesh

    from rtpe_tpu.models.hrnet_packed import fold_w48_params

    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    fw = fold_w48_params(v, cfg)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("model",))
    return cfg, model, v, fw, mesh


@pytest.mark.slow
def test_spatial_full_forward_matches_canonical_small():
    """The FULL W48 forward H-sharded 4-way (every stage, fuse layer,
    and the cat-deconv head under halo exchange) equals the canonical
    apply (VERDICT r2 item 8)."""
    from rtpe_tpu.parallel.spatial import spatial_forward_w48

    cfg, model, v, fw, mesh = _full_forward_setup()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 64, 3),
                          jnp.float32)
    want_c, want_r = model.apply(v, x, train=False)
    got_c, got_r = spatial_forward_w48(fw, x, mesh, cfg)
    for want, got in ((want_c, got_c), (want_r, got_r)):
        a = np.asarray(want, np.float32)
        b = np.asarray(got, np.float32)
        assert np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12) \
            < 1e-4  # fp32 BN-fold reassociation budget


@pytest.mark.slow
def test_spatial_full_forward_1280px():
    """>=1280 px input (the size class single-chip HBM cannot hold at
    batch) through the fully sharded forward, 4-way model axis."""
    from rtpe_tpu.parallel.spatial import spatial_forward_w48

    cfg, model, v, fw, mesh = _full_forward_setup()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 1280, 128, 3),
                          jnp.float32)
    want_c, want_r = model.apply(v, x, train=False)
    got_c, got_r = spatial_forward_w48(fw, x, mesh, cfg)
    assert got_c.shape == want_c.shape == (1, 320, 32, 34)
    assert got_r.shape == want_r.shape == (1, 640, 64, 17)
    for want, got in ((want_c, got_c), (want_r, got_r)):
        a = np.asarray(want, np.float32)
        b = np.asarray(got, np.float32)
        assert np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12) \
            < 1e-4


@pytest.mark.slow
def test_spatial_full_forward_reduced_cfg():
    """Sharded-forward coverage (slow: ~3-min XLA compile): a reduced
    HRNet (same graph family — all stages, fuse layers, cat-deconv)
    compiles in seconds and must equal its canonical apply."""
    from jax.sharding import Mesh

    from rtpe_tpu.models.hrnet import HRNetConfig, StageCfg
    from rtpe_tpu.models.hrnet_packed import fold_w48_params
    from rtpe_tpu.parallel.spatial import spatial_forward_w48

    small = HRNetConfig(
        num_joints=5,
        stage2=StageCfg(1, 2, "BASIC", (2, 2), (8, 16)),
        stage3=StageCfg(2, 3, "BASIC", (2, 2, 2), (8, 16, 32)),
        stage4=StageCfg(1, 4, "BASIC", (2, 2, 2, 2), (8, 16, 32, 64)),
        deconv_chans=(8,), deconv_num_blocks=2)
    model = PoseHigherHRNet(cfg=small, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    fw = fold_w48_params(v, small)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("model",))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 128, 64, 3),
                          jnp.float32)
    want_c, want_r = model.apply(v, x, train=False)
    got_c, got_r = spatial_forward_w48(fw, x, mesh, small)
    for want, got in ((want_c, got_c), (want_r, got_r)):
        a = np.asarray(want, np.float32)
        b = np.asarray(got, np.float32)
        assert np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12) \
            < 1e-4


@pytest.mark.slow
def test_predictor_spatial_mesh_matches_dense():
    """PosePredictor(spatial_mesh=...) — the >1k-px serving entry
    (VERDICT r3 item 6) — returns the same people as the dense
    predictor.  Reduced cfg keeps the shard_map compile in seconds;
    W48-scale equality is the slow-lane tests above."""
    from jax.sharding import Mesh

    from rtpe_tpu.eval.predictor import PosePredictor
    from rtpe_tpu.models.hrnet import HRNetConfig, StageCfg

    small = HRNetConfig(
        num_joints=5,
        stage2=StageCfg(1, 2, "BASIC", (2, 2), (8, 16)),
        stage3=StageCfg(2, 3, "BASIC", (2, 2, 2), (8, 16, 32)),
        stage4=StageCfg(1, 4, "BASIC", (2, 2, 2, 2), (8, 16, 32, 64)),
        deconv_chans=(8,), deconv_num_blocks=2)
    model = PoseHigherHRNet(cfg=small, dtype=jnp.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    rng = np.random.RandomState(0)
    img = (rng.rand(128, 128, 3) * 255).astype(np.uint8)

    dense = PosePredictor(model, v, num_joints=5, input_size=128)
    spatial = PosePredictor(model, v, num_joints=5, input_size=128,
                            spatial_mesh=mesh)
    people_d, scores_d = dense.predict(img)
    people_s, scores_s = spatial.predict(img)
    assert len(people_d) == len(people_s)
    for a, b in zip(people_d, people_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(scores_s),
                               np.asarray(scores_d), rtol=1e-3,
                               atol=1e-4)


def test_predictor_spatial_mesh_rejects_bad_combos():
    from jax.sharding import Mesh

    from rtpe_tpu.eval.predictor import PosePredictor

    cfg = w48_config()
    model = PoseHigherHRNet(cfg=cfg, dtype=jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))
    with pytest.raises(ValueError, match="spatial_mesh"):
        PosePredictor(model, {}, packed=True, spatial_mesh=mesh)
