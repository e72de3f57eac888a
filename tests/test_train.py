"""Training-stack tests: loss parity vs reference torch, SGDR parity,
and a multi-device train-step smoke test on the 8-way CPU mesh."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from conftest import add_reference_to_path, has_reference

from rtpe_tpu.models import AttentionStudentSteps
from rtpe_tpu.parallel import make_mesh, shard_batch
from rtpe_tpu.train import (
    DistillConfig,
    DistillTrainState,
    SgdrConfig,
    bce_with_logits,
    distillation_bce_loss_keypoint_mining,
    label_params,
    make_distill_train_step,
    masked_bce_with_logits,
    masked_mse,
    sgdr_schedule,
)

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference not mounted")


def _rand(shape, seed):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_masked_mse_matches_reference():
    add_reference_to_path()
    from rtpe.optimization import MaskedMseLoss
    pred, gt = _rand((2, 4, 8, 8), 0), _rand((2, 4, 8, 8), 1)
    mask = (_rand((2, 4, 8, 8), 2) > 0.5).astype(np.float32)
    want = MaskedMseLoss()(torch.from_numpy(pred), torch.from_numpy(gt),
                           torch.from_numpy(mask)).item()
    got = float(masked_mse(jnp.asarray(pred), jnp.asarray(gt),
                           jnp.asarray(mask)))
    assert got == pytest.approx(want, rel=1e-6)


def test_masked_bce_matches_reference():
    add_reference_to_path()
    from rtpe.optimization import MaskedBceWithLogits
    pred = (_rand((2, 1, 8, 8), 3) - 0.5) * 8
    gt = (_rand((2, 1, 8, 8), 4) > 0.5).astype(np.float32)
    mask = (_rand((2, 1, 8, 8), 5) > 0.3).astype(np.float32)
    want = MaskedBceWithLogits(pos_weight=7)(
        torch.from_numpy(pred), torch.from_numpy(gt),
        torch.from_numpy(mask)).item()
    got = float(masked_bce_with_logits(jnp.asarray(pred), jnp.asarray(gt),
                                       jnp.asarray(mask), pos_weight=7.0))
    assert got == pytest.approx(want, rel=1e-5)


def test_distillation_bce_mining_matches_reference():
    add_reference_to_path()
    from rtpe.optimization import DistillationBceLossKeypointMining
    student = (_rand((2, 17, 10, 10), 6) - 0.5) * 6
    teacher = _rand((2, 17, 10, 10), 7) * 1.4 - 0.2  # outside [0,1]
    gt = _rand((2, 17, 10, 10), 8)
    gt[gt < 0.4] = 0.0
    mask = np.ones((2, 17, 10, 10), np.float32)
    ref_loss = DistillationBceLossKeypointMining(100, 100, "cpu")(
        torch.from_numpy(student), torch.from_numpy(teacher),
        torch.from_numpy(gt), alpha=0.8, mask=torch.from_numpy(mask.copy()),
        background_factor=0.5).item()
    got = float(distillation_bce_loss_keypoint_mining(
        jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(gt),
        alpha=0.8, mask=jnp.asarray(mask), background_factor=0.5,
        teacher_pos_weight=100.0, gt_pos_weight=100.0))
    assert got == pytest.approx(ref_loss, rel=1e-5)


def test_sgdr_schedule_matches_reference_fixed_period():
    add_reference_to_path()
    from rtpe.optimization import SgdrScheduler
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    ref = SgdrScheduler(opt, max_lr=0.025, min_lr=0.003, period=100,
                        scale_max_lr=1.0, scale_min_lr=1.0,
                        scale_period=1.0)
    sched = sgdr_schedule(SgdrConfig(0.025, 0.003, 100.0, 1.0, 1.0, 1.0))
    for t in range(350):
        want = opt.param_groups[0]["lr"]
        got = float(sched(t))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-8), f"step {t}"
        opt.step()
        ref.step()


def test_sgdr_schedule_scaled_cycles_structure():
    cfg = SgdrConfig(0.025, 0.003, 700.0, 1.02, 1.0, 1.01)
    sched = sgdr_schedule(cfg)
    lrs = np.array([float(sched(t)) for t in range(0, 3000, 1)])
    assert lrs[0] == pytest.approx(0.025, rel=1e-6)
    # second cycle peaks at 0.025 * 1.02 around t=700
    assert lrs[700] == pytest.approx(0.025 * 1.02, rel=1e-3)
    assert lrs.min() >= 0.003 - 1e-6
    assert lrs.max() <= 0.025 * 1.02 ** 5


def test_label_params_partition():
    model = AttentionStudentSteps(inplanes=8, num_heatmaps=5, ae_dims=0,
                                  alt_planes=6, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    labels = flatten_dict(label_params(variables["params"]))
    groups = set(labels.values())
    assert groups == {"att", "det", "frozen"}
    for path, lab in labels.items():
        if path[0] in ("stem",) or path[0].startswith("mid_stem"):
            assert lab == "frozen", path
        if path[0].startswith("step") or path[0].startswith("alt_stem") \
                or path[0] == "det_top":
            assert lab == "det", path
        if path[0] in ("att", "att_top"):
            assert lab == "att", path


def test_train_step_on_cpu_mesh():
    mesh = make_mesh()
    assert mesh.devices.size == 8

    model = AttentionStudentSteps(inplanes=8, num_heatmaps=17, ae_dims=0,
                                  alt_planes=6, detach_att_for_det=True,
                                  dtype=jnp.float32)
    b, h, w = 8, 64, 64
    rng = np.random.RandomState(0)
    x = jnp.zeros((1, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    cfg = DistillConfig()
    state = DistillTrainState.create(variables, cfg)
    step_fn = make_distill_train_step(model, cfg)

    batch = {
        "img": rng.rand(b, h, w, 3).astype(np.float32),
        "img_alt": rng.rand(b, h, w, 3).astype(np.float32),
        "segm_mask": (rng.rand(b, h, w, 1) > 0.7).astype(np.float32),
        "gt_hms": (rng.rand(b, h, w, 17) > 0.9).astype(np.float32),
        "teacher_hms": rng.rand(b, h, w, 17).astype(np.float32),
        "mask": np.ones((b, h, w, 1), np.float32),
    }
    with mesh:
        sharded = shard_batch(batch, mesh)
        p0 = jax.tree_util.tree_map(np.asarray, state.params)
        losses = []
        for _ in range(4):
            state, metrics = step_fn(state, sharded)
            losses.append(float(metrics["keypoints_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizing

    # frozen params untouched; att/det params moved
    p1 = state.params
    f0, f1 = flatten_dict(p0), flatten_dict(p1)
    labels = flatten_dict(label_params(p1))
    moved = {"att": 0.0, "det": 0.0, "frozen": 0.0}
    for path in f0:
        moved[labels[path]] += float(
            np.abs(np.asarray(f1[path]) - np.asarray(f0[path])).max())
    assert moved["frozen"] == 0.0
    assert moved["att"] > 0.0
    assert moved["det"] > 0.0
    assert float(state.step) == 4
