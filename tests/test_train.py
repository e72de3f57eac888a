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


@pytest.mark.slow
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


def _tiny_model_and_batch(b=8, h=32, w=32, seed=0):
    model = AttentionStudentSteps(inplanes=8, num_heatmaps=17, ae_dims=0,
                                  alt_planes=6, detach_att_for_det=True,
                                  dtype=jnp.float32)
    rng = np.random.RandomState(seed)
    x = jnp.zeros((1, h, w, 3))
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    batch = {
        "img": rng.rand(b, h, w, 3).astype(np.float32),
        "img_alt": rng.rand(b, h, w, 3).astype(np.float32),
        "segm_mask": (rng.rand(b, h, w, 1) > 0.7).astype(np.float32),
        "gt_hms": (rng.rand(b, h, w, 17) > 0.9).astype(np.float32),
        "teacher_hms": rng.rand(b, h, w, 17).astype(np.float32),
        "mask": np.ones((b, h, w, 1), np.float32),
    }
    return model, variables, batch


@pytest.mark.slow
def test_grad_accum_equals_single_step_on_duplicated_batch():
    """grad_accum=2 on a batch of two identical halves must produce the
    exact same parameter/optimizer update as grad_accum=1 on one half:
    with identical microbatches, per-micro BatchNorm statistics equal
    the half-batch statistics, so gradients and their mean coincide."""
    model, variables, half = _tiny_model_and_batch(b=4)
    dup = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}
    cfg = DistillConfig()

    s_acc = DistillTrainState.create(variables, cfg)
    s_one = DistillTrainState.create(variables, cfg)
    step_acc = make_distill_train_step(model, cfg, grad_accum=2)
    step_one = make_distill_train_step(model, cfg, grad_accum=1)
    s_acc, m_acc = step_acc(s_acc, dup)
    s_one, m_one = step_one(s_one, half)

    np.testing.assert_allclose(float(m_acc["keypoints_loss"]),
                               float(m_one["keypoints_loss"]),
                               rtol=1e-6)
    fa = flatten_dict(s_acc.params)
    fo = flatten_dict(s_one.params)
    for path in fa:
        np.testing.assert_allclose(np.asarray(fa[path]),
                                   np.asarray(fo[path]),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))


@pytest.mark.slow
def test_grad_accum_is_mean_of_microbatch_grads():
    """Accumulated gradients == arithmetic mean of the per-microbatch
    gradients computed independently with chained batch_stats (the
    defining property of the scan)."""
    import optax

    from rtpe_tpu.train.step import (
        att_divisor_at, make_distill_optimizer)

    model, variables, batch = _tiny_model_and_batch(b=4)
    cfg = DistillConfig()
    n = 2
    state = DistillTrainState.create(variables, cfg)
    step = make_distill_train_step(model, cfg, grad_accum=n)
    new_state, _ = step(state, batch)

    # manual reference: two sequential grad computations
    from rtpe_tpu.ops.resize import resize_bilinear
    from rtpe_tpu.train.losses import (
        bce_with_logits, distillation_bce_loss_keypoint_mining)

    def loss_fn(params, stats, mb):
        (att, det), mut = model.apply(
            {"params": params, "batch_stats": stats},
            mb["img"], mb["img_alt"],
            att_divisor=att_divisor_at(state.step, cfg),
            train=True, mutable=["batch_stats"])
        segm = resize_bilinear(mb["segm_mask"], att.shape[1:3],
                               align_corners=False)
        gt = resize_bilinear(mb["gt_hms"], det.shape[1:3],
                             align_corners=False)
        teacher = resize_bilinear(mb["teacher_hms"], det.shape[1:3],
                                  align_corners=False)
        mask = jnp.broadcast_to(
            resize_bilinear(mb["mask"], det.shape[1:3],
                            align_corners=False), gt.shape)
        seg_loss = bce_with_logits(att, segm, cfg.att_pos_weight)
        det_loss = distillation_bce_loss_keypoint_mining(
            det, teacher, gt, alpha=cfg.distillation_alpha, mask=mask,
            background_factor=cfg.background_factor,
            teacher_pos_weight=cfg.det_pos_weight,
            gt_pos_weight=cfg.det_pos_weight)
        return seg_loss + det_loss, mut["batch_stats"]

    stats = state.batch_stats
    grads_sum = None
    for i in range(n):
        mb = {k: v[i * 2:(i + 1) * 2] for k, v in batch.items()}
        g, stats = jax.grad(loss_fn, has_aux=True)(
            state.params, stats, mb)
        grads_sum = g if grads_sum is None else jax.tree_util.tree_map(
            jnp.add, grads_sum, g)
    grads_mean = jax.tree_util.tree_map(lambda g: g / n, grads_sum)
    tx, _, _ = make_distill_optimizer(cfg)
    updates, _ = tx.update(grads_mean, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, updates)

    fa = flatten_dict(new_state.params)
    fw = flatten_dict(want_params)
    for path in fa:
        np.testing.assert_allclose(np.asarray(fa[path]),
                                   np.asarray(fw[path]),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))
    # chained batch_stats must match too
    fs = flatten_dict(new_state.batch_stats)
    ft = flatten_dict(stats)
    for path in fs:
        np.testing.assert_allclose(np.asarray(fs[path]),
                                   np.asarray(ft[path]),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))


@pytest.mark.slow
def test_zero1_sharded_opt_state_matches_replicated():
    """ZeRO-1 on the 8-way CPU mesh: momentum buffers are physically
    1/8 per device, and one train step produces the same result as the
    fully-replicated run."""
    from rtpe_tpu.parallel import replicate, zero1_state_sharding

    mesh = make_mesh()
    model, variables, batch = _tiny_model_and_batch(b=8)
    cfg = DistillConfig()
    step_fn = make_distill_train_step(model, cfg)

    with mesh:
        sharded_batch = shard_batch(batch, mesh)

        s_rep = replicate(DistillTrainState.create(variables, cfg), mesh)
        s_rep, m_rep = step_fn(s_rep, sharded_batch)

        s_z = DistillTrainState.create(variables, cfg)
        # the test model is tiny; shard anything above 128 elements
        shardings = zero1_state_sharding(s_z, mesh, min_elems=128)
        s_z = jax.device_put(s_z, shardings)
        # momentum shards shrink on at least the large conv kernels
        shrunk = 0
        for leaf in jax.tree_util.tree_leaves(s_z.opt_state):
            if hasattr(leaf, "addressable_shards") and leaf.size >= 128:
                shard = leaf.addressable_shards[0]
                if np.prod(shard.data.shape) < leaf.size:
                    shrunk += 1
        assert shrunk > 0
        s_z, m_z = step_fn(s_z, sharded_batch)

    np.testing.assert_allclose(float(m_z["keypoints_loss"]),
                               float(m_rep["keypoints_loss"]), rtol=1e-6)
    fa = flatten_dict(jax.device_get(s_z.params))
    fb = flatten_dict(jax.device_get(s_rep.params))
    for path in fa:
        np.testing.assert_allclose(np.asarray(fa[path]),
                                   np.asarray(fb[path]),
                                   rtol=1e-5, atol=1e-6, err_msg=str(path))


@pytest.mark.slow
def test_bn_bf16_step_trains_like_f32():
    """The bf16-BN-compute train step (the production config of
    scripts/distillation.py; VERDICT r3 item 2) follows the f32-BN
    step: same loss at step 0 within bf16 tolerance, losses stay close
    and DECREASE over 8 steps, and parameters keep moving together.
    Batch statistics remain fp32 in both (flax
    force_float32_reductions)."""
    model, variables, batch = _tiny_model_and_batch()
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    cfg = DistillConfig()

    losses = {}
    for label, bn_dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        state = DistillTrainState.create(variables, cfg)
        step = make_distill_train_step(model, cfg, bn_dtype=bn_dtype)
        ls = []
        for _ in range(8):
            state, m = step(state, batch)
            ls.append(float(m["keypoints_loss"])
                      + float(m["attention_loss"]))
        losses[label] = ls
        # running batch_stats remain fp32
        leaf = jax.tree_util.tree_leaves(state.batch_stats)[0]
        assert leaf.dtype == jnp.float32

    f32, bf16 = np.asarray(losses["f32"]), np.asarray(losses["bf16"])
    np.testing.assert_allclose(bf16[0], f32[0], rtol=0.03)
    assert bf16[-1] < bf16[0]  # it trains
    # loss curves agree within a few percent throughout
    np.testing.assert_allclose(bf16, f32, rtol=0.05)


@pytest.mark.slow
def test_remat_step_matches_baseline():
    """CAM-block rematerialization (``AttentionStudentSteps(remat=
    True)``, the production default of scripts/distillation.py) is a
    pure schedule change: the parameter tree is identical, and one
    train step produces the same losses and parameters as the
    non-remat step to numerical tolerance (the backward recomputes
    block internals instead of reloading them; VERDICT r3 item 2 —
    the step is HBM-bound, so recompute targets the binding
    resource)."""
    model, variables, batch = _tiny_model_and_batch()
    rmodel = model.clone(remat=True)
    rvars = rmodel.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 32, 32, 3)), train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(rvars))
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(rvars)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    cfg = DistillConfig()
    s0 = DistillTrainState.create(variables, cfg)
    s1 = DistillTrainState.create(rvars, cfg)
    s0, m0 = make_distill_train_step(model, cfg)(s0, batch)
    s1, m1 = make_distill_train_step(rmodel, cfg)(s1, batch)

    np.testing.assert_allclose(float(m1["keypoints_loss"]),
                               float(m0["keypoints_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["attention_loss"]),
                               float(m0["attention_loss"]), rtol=1e-6)
    f0 = flatten_dict(s0.params)
    f1 = flatten_dict(s1.params)
    for k in f0:
        np.testing.assert_allclose(np.asarray(f1[k]),
                                   np.asarray(f0[k]),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg="/".join(k))
