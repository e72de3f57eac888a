"""Tests for TTA, RSB, loss scaling, and spatial halo convolution."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference


# -----------------------------------------------------------------------------
# TTA
# -----------------------------------------------------------------------------
def test_flip_back_matches_reference():
    add_reference_to_path()
    from rtpe.third_party.transforms import flip_back as ref_flip_back

    from rtpe_tpu.data.coco import COCO_FLIP_PAIRS
    from rtpe_tpu.eval.tta import flip_back

    x = np.random.RandomState(0).rand(2, 24, 32, 17).astype(np.float32)
    # reference takes NCHW; it mutates its input through views, so pass
    # a copy
    want = ref_flip_back(np.ascontiguousarray(x.transpose(0, 3, 1, 2)),
                         [list(p) for p in COCO_FLIP_PAIRS])
    got = np.asarray(flip_back(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_tta_forward_flip_consistency():
    """For a horizontally symmetric model (identity heads), flip TTA
    must reproduce the single forward."""
    from rtpe_tpu.eval.tta import tta_forward

    rng = np.random.RandomState(1)
    hms = rng.rand(1, 16, 16, 17).astype(np.float32)
    # symmetric fake detector: returns fixed heatmaps transformed the
    # same way its input was (here: we fake it by returning input-
    # derived maps so flip consistency holds structurally)
    j = 17

    def apply_fn(batch):
        b = batch.shape[0]
        coarse = jnp.concatenate(
            [batch[..., :1].repeat(j, axis=-1),
             jnp.zeros((b, batch.shape[1], batch.shape[2], j))], axis=-1)
        refined = batch[..., :1].repeat(j, axis=-1)
        return coarse, refined

    img = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    hm1, tags1 = tta_forward(apply_fn, img, num_joints=j, with_flip=False)
    hm2, tags2 = tta_forward(apply_fn, img, num_joints=j, with_flip=True)
    assert hm1.shape == hm2.shape
    assert tags2.shape[-1] == 2 * tags1.shape[-1]  # D doubles with flip
    # flip-averaged heatmaps of a non-symmetric input differ, but both
    # stay in the convex hull of inputs
    assert float(jnp.max(hm2)) <= float(jnp.max(img[..., 0])) + 1e-5


def test_tta_multiscale_aggregation():
    """Multi-scale TTA: heatmaps from each scale are resized to the
    base resolution and averaged; tags come from the primary scale."""
    from rtpe_tpu.eval.tta import tta_forward

    j = 4

    def apply_fn(batch):
        # a "model" whose heatmap response is the constant image mean,
        # so any correct resize+average reproduces that constant
        b, h, w, _ = batch.shape
        val = jnp.mean(batch, axis=(1, 2, 3), keepdims=True)
        coarse = jnp.broadcast_to(val, (b, h // 4, w // 4, 2 * j))
        refined = jnp.broadcast_to(val, (b, h // 2, w // 2, j))
        return coarse, refined

    img = jnp.full((1, 64, 64, 3), 0.25)
    hm, tags = tta_forward(apply_fn, img, num_joints=j, with_flip=False,
                           scales=(1.0, 2.0))
    assert hm.shape == (1, 32, 32, j)
    np.testing.assert_allclose(np.asarray(hm), 0.25, atol=1e-6)
    assert tags.shape[-1] == j  # primary scale only


def test_tta_forward_batched_matches_per_image():
    """Batched TTA (flip as a doubled leading axis, VERDICT r3 item 4)
    equals running each image through the bs=1 path, for flip alone and
    flip+multi-scale."""
    from rtpe_tpu.eval.tta import tta_forward

    rng = np.random.RandomState(2)
    j = 5

    # a non-symmetric "model" with real spatial structure: depthwise-ish
    # mixes of the input so flips genuinely change the maps
    k_hm = jnp.asarray(rng.rand(3, j).astype(np.float32))
    k_tag = jnp.asarray(rng.rand(3, j).astype(np.float32))

    def apply_fn(batch):
        b, h, w, _ = batch.shape
        base = batch[:, ::2, ::2, :]  # (b, h/2, w/2, 3)
        refined = jnp.einsum("bhwc,cj->bhwj", base, k_hm)
        coarse_hm = refined[:, ::2, ::2, :]
        tags = jnp.einsum("bhwc,cj->bhwj", base[:, ::2, ::2, :], k_tag)
        coarse = jnp.concatenate([coarse_hm, tags], axis=-1)
        return coarse, refined

    imgs = jnp.asarray(rng.rand(3, 32, 32, 3).astype(np.float32))
    for kwargs in ({"with_flip": True},
                   {"with_flip": True, "scales": (1.0, 2.0)}):
        hm_b, tag_b = tta_forward(apply_fn, imgs, num_joints=j, **kwargs)
        for i in range(imgs.shape[0]):
            hm_1, tag_1 = tta_forward(apply_fn, imgs[i:i + 1],
                                      num_joints=j, **kwargs)
            np.testing.assert_allclose(np.asarray(hm_b[i:i + 1]),
                                       np.asarray(hm_1), atol=1e-6)
            np.testing.assert_allclose(np.asarray(tag_b[i:i + 1]),
                                       np.asarray(tag_1), atol=1e-6)


# -----------------------------------------------------------------------------
# RSB
# -----------------------------------------------------------------------------
@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_rsb_matches_reference():
    add_reference_to_path()
    from rtpe.third_party.RSB import ResidualStepBlock as TorchRSB

    from flax.traverse_util import flatten_dict, unflatten_dict

    from rtpe_tpu.models.rsb import ResidualStepBlock

    torch.manual_seed(0)
    tm = TorchRSB(64, 64)
    tm.eval()
    g = torch.Generator().manual_seed(1)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)

    fm = ResidualStepBlock(planes=64, dtype=jnp.float32)
    x = np.random.RandomState(2).rand(1, 3, 16, 16).astype(np.float32)
    x_nhwc = jnp.asarray(np.zeros((1, 16, 16, 64), np.float32))
    x64 = np.random.RandomState(2).rand(1, 64, 16, 16).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.asarray(x64.transpose(0, 2, 3, 1)))

    # map torch statedict -> flax names
    name_map = {"conv_bn_relu1": "expand", "conv_bn_relu3": "project"}
    for i in range(1, 5):
        for d in range(1, i + 1):
            name_map[f"conv_bn_relu2_{i}_{d}"] = f"b{i}_{d}"
    flat = dict(flatten_dict(variables))
    for tname, fname in name_map.items():
        sd = {k: v.detach().numpy()
              for k, v in tm.state_dict().items() if k.startswith(tname)}
        flat[("params", fname, "conv", "kernel")] = np.transpose(
            sd[f"{tname}.conv.weight"], (2, 3, 1, 0))
        flat[("params", fname, "conv", "bias")] = sd[f"{tname}.conv.bias"]
        flat[("params", fname, "bn", "scale")] = sd[f"{tname}.bn.weight"]
        flat[("params", fname, "bn", "bias")] = sd[f"{tname}.bn.bias"]
        flat[("batch_stats", fname, "bn", "mean")] = \
            sd[f"{tname}.bn.running_mean"]
        flat[("batch_stats", fname, "bn", "var")] = \
            sd[f"{tname}.bn.running_var"]
    variables = unflatten_dict(flat)

    with torch.no_grad():
        want = tm(torch.from_numpy(x64)).numpy()
    got = np.asarray(fm.apply(variables,
                              jnp.asarray(x64.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


# -----------------------------------------------------------------------------
# Loss scaling
# -----------------------------------------------------------------------------
def test_dynamic_loss_scaler_dynamics():
    from rtpe_tpu.train.loss_scaling import (
        init_dynamic_scaler,
        scaled_grads_or_skip,
    )

    state = init_dynamic_scaler(init_scale=16.0)
    good = {"w": jnp.ones((3,)) * 32.0}
    bad = {"w": jnp.array([1.0, jnp.inf, 0.0])}

    g, state, overflow = scaled_grads_or_skip(good, state)
    assert not bool(overflow)
    np.testing.assert_allclose(np.asarray(g["w"]), 2.0)  # 32/16

    g, state, overflow = scaled_grads_or_skip(bad, state)
    assert bool(overflow)
    np.testing.assert_allclose(np.asarray(g["w"]), 0.0)  # skip step
    assert float(state.scale) == 8.0  # halved

    # growth after scale_window clean steps
    from rtpe_tpu.train.loss_scaling import update_scaler
    for _ in range(1000):
        state = update_scaler(state, jnp.bool_(False))
    assert float(state.scale) == 16.0


# -----------------------------------------------------------------------------
# Spatial halo conv
# -----------------------------------------------------------------------------
def test_halo_conv_matches_dense():
    from jax.sharding import Mesh

    from rtpe_tpu.parallel.spatial import halo_conv, shard_spatial

    devices = np.array(jax.devices()[:8]).reshape(1, 8)
    mesh = Mesh(devices, axis_names=("data", "model"))

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 32, 8).astype(np.float32)
    k = rng.rand(3, 3, 8, 16).astype(np.float32)

    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))

    xs = shard_spatial(jnp.asarray(x), mesh, "model")
    got = halo_conv(xs, jnp.asarray(k), mesh, "model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_halo_conv_5x5_and_stride():
    from jax.sharding import Mesh

    from rtpe_tpu.parallel.spatial import halo_conv, shard_spatial

    devices = np.array(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))
    rng = np.random.RandomState(1)
    x = rng.rand(1, 32, 16, 4).astype(np.float32)
    k = rng.rand(5, 5, 4, 4).astype(np.float32)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1),
        ((2, 2), (2, 2)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xs = shard_spatial(jnp.asarray(x), mesh, "model")
    got = halo_conv(xs, jnp.asarray(k), mesh, "model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_dynamic_loss_scaled_step_matches_unscaled_and_skips_overflow():
    """The wired FP16_Optimizer-style path: power-of-two scaling is
    exact on clean batches; non-finite gradients skip params AND
    momentum while the scale halves (reference loss_scaler.py:127-167).
    """
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from rtpe_tpu.models import CamStudent
    from rtpe_tpu.train.legacy_steps import (
        StudentDistillConfig, StudentTrainState, make_student_train_step)

    model = CamStudent(inplanes=8, num_stages=2, num_heatmaps=5,
                       ae_dims=1, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    cfg = StudentDistillConfig(background_factor=0.01)

    rng = np.random.RandomState(0)
    batch = {
        "img": rng.rand(2, 64, 64, 3).astype(np.float32),
        "gt_hms": (rng.rand(2, 64, 64, 6) > 0.9).astype(np.float32),
        "teacher_hms": rng.rand(2, 64, 64, 6).astype(np.float32),
        "mask": np.ones((2, 64, 64, 1), np.float32),
    }

    plain = StudentTrainState.create(variables, cfg)
    scaled = StudentTrainState.create(variables, cfg,
                                      dynamic_loss_scale=True,
                                      init_scale=2.0 ** 10)
    step_plain = make_student_train_step(model, cfg, out_hw=(64, 64))
    step_scaled = make_student_train_step(model, cfg, out_hw=(64, 64),
                                          dynamic_loss_scale=True)

    plain, mp = step_plain(plain, batch)
    scaled, ms = step_scaled(scaled, batch)
    assert float(ms["overflow"]) == 0.0
    assert float(ms["loss"]) == pytest.approx(float(mp["loss"]), rel=1e-6)
    fp, fs = flatten_dict(plain.params), flatten_dict(scaled.params)
    for path in fp:
        np.testing.assert_allclose(np.asarray(fs[path]),
                                   np.asarray(fp[path]),
                                   rtol=1e-6, atol=1e-7, err_msg=str(path))

    # overflow batch: params and momentum untouched, scale halves
    bad = dict(batch)
    bad["img"] = batch["img"].copy()
    bad["img"][0, 0, 0, 0] = np.inf
    before_p = jax.device_get(scaled.params)
    before_o = jax.device_get(scaled.opt_state)
    before_scale = float(scaled.scaler.scale)
    scaled, m_bad = step_scaled(scaled, bad)
    assert float(m_bad["overflow"]) == 1.0
    assert float(scaled.scaler.scale) == before_scale / 2
    for path, val in flatten_dict(before_p).items():
        np.testing.assert_array_equal(
            np.asarray(flatten_dict(jax.device_get(scaled.params))[path]),
            np.asarray(val))
    # momentum (float leaves) reverted; LR-schedule counts (integer
    # leaves) STILL advance — the reference steps its SgdrScheduler
    # every iteration while FP16_Optimizer skips only optimizer.step
    after_o = jax.device_get(scaled.opt_state)
    n_int = 0
    for a, b in zip(jax.tree_util.tree_leaves(before_o),
                    jax.tree_util.tree_leaves(after_o)):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(b.dtype, np.integer):
            np.testing.assert_array_equal(b, a + 1)
            n_int += 1
        else:
            np.testing.assert_array_equal(b, a)
    assert n_int >= 1  # the schedule count exists and advanced


def test_bench_device_probe_detects_cpu():
    """bench.py's orchestrator liveness gate (the tunneled TPU backend
    can wedge INSIDE jax.devices(), r4): the subprocess probe must
    report alive on a healthy backend and never hang the caller."""
    import importlib.util
    import os as _os
    spec = importlib.util.spec_from_file_location(
        "bench", _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    _os.environ.setdefault("RTPE_PLATFORM", "cpu")
    old = dict(_os.environ)
    _os.environ["JAX_PLATFORMS"] = "cpu"
    _os.environ["RTPE_PLATFORM"] = "cpu"
    try:
        alive, plat = bench._probe_devices(timeout_s=120)
    finally:
        _os.environ.clear()
        _os.environ.update(old)
    assert alive and plat == "cpu", (alive, plat)


def test_bench_ask_tied_sections_get_second_retry(monkeypatch, capsys):
    """Orchestrator retry policy: an ask-tied section (a VERDICT
    done-criterion metric) that loses two launches to compile-service
    wedges gets a THIRD; upside sections (pipeline*) do not extend the
    run.  Drives bench.main() with the subprocess layer stubbed."""
    import importlib.util
    import json as _json
    import os as _os
    spec = importlib.util.spec_from_file_location(
        "bench_rt", _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    calls = {}

    def fake_run(name, env_extra=None, timeout=None):
        calls[name] = calls.get(name, 0) + 1
        if name == "headline":
            return {"value": 100.0, "bs": 128, "headline_extra": 1.0}
        if name == "int8act":   # wedge twice, land on the 3rd launch
            return ({"int8act_forward_img_s_bs128": 555.0}
                    if calls[name] >= 3 else None)
        if name == "pipeline":  # upside: wedges must NOT earn retry #2
            return None
        return {f"{name}_ok": 1.0}

    monkeypatch.setattr(bench, "_run_section_subprocess", fake_run)
    monkeypatch.setattr(bench, "_probe_devices", lambda **kw: (True, "cpu"))
    monkeypatch.setattr(bench, "_probe_compile", lambda *a, **kw: True)
    monkeypatch.setenv("RTPE_BENCH_BUDGET_S", "3300")
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    result = _json.loads(line)
    assert result["value"] == 100.0
    assert result["extra"]["int8act_forward_img_s_bs128"] == 555.0
    assert result["extra"]["headline_extra"] == 1.0
    assert "value" not in result["extra"]  # headline stays top-level
    assert calls["int8act"] == 3   # final retry fired (ask-tied)
    assert calls["pipeline"] == 2  # upside sections keep one retry
    assert calls["train"] == 1     # healthy sections run once


def test_bench_outage_flushes_host_metrics(monkeypatch, capsys):
    """Simulated 100%-wedge compile-service outage (the r4 driver-run
    failure mode: device discovery healthy, EVERY compile wedges,
    BENCH_r04.json landed empty after four 420 s headline burns).
    The orchestrator must (a) detect the sick service with the cheap
    probe, (b) land the compile-free host-grouping metrics, (c) cap
    headline attempts at <=2, and (d) finish INSIDE the observed
    driver window (~1680 s) so the final JSON line is printed by the
    bench, not salvaged by a SIGTERM."""
    import importlib.util
    import json as _json
    import os as _os
    spec = importlib.util.spec_from_file_location(
        "bench_outage", _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    class FakeTime:
        t = 0.0

        @classmethod
        def time(cls):
            return cls.t

        @classmethod
        def sleep(cls, s):
            cls.t += s

    calls = {}
    PROBE_T = 120.0

    def fake_probe_compile(timeout_s=120):
        FakeTime.t += PROBE_T  # a sick probe costs its full timeout
        calls["probe"] = calls.get("probe", 0) + 1
        return False

    def fake_run(name, env_extra=None, timeout=None):
        calls[name] = calls.get(name, 0) + 1
        assert timeout is not None and timeout <= bench.SECTION_TIMEOUT[
            name], "orchestrator must deadline-bound every launch"
        FakeTime.t += timeout  # every section wedges to its bound
        if name == "decode_host":
            # per-metric flush salvages the pure-host numbers even
            # though the section later wedges on its first jit
            return {"decode_hostgroup_fast_ms_img": 1.2,
                    "decode_hostgroup_oracle_ms_img": 14.0}
        return None

    monkeypatch.setattr(bench, "time", FakeTime)
    monkeypatch.setattr(bench, "_run_section_subprocess", fake_run)
    monkeypatch.setattr(bench, "_probe_devices",
                        lambda **kw: (True, "tpu"))
    monkeypatch.setattr(bench, "_probe_compile", fake_probe_compile)
    monkeypatch.setenv("RTPE_BENCH_BUDGET_S", "1500")
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    result = _json.loads(out[-1])
    # the compile-free host metrics are IN the driver artifact
    assert result["extra"]["decode_hostgroup_fast_ms_img"] == 1.2
    assert result["value"] == 0.0  # honest: no headline landed
    # the whole battery stayed inside the observed driver window
    assert FakeTime.t <= 1680, FakeTime.t
    # headline burns are capped (r4 spent 4 x 420 s = the window)
    assert calls.get("headline", 0) <= 2, calls
    # the sick service was actually probed on a backoff
    assert calls["probe"] >= 3, calls
