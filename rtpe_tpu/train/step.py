"""The distillation train step: dual-loss, dual-optimizer, pjit-ready.

Reproduces the effective update rule of the reference training loop
(``distillation.py:289-336``):

* attention params (att pyramid + att_top) step on the segmentation
  BCE loss (pos_weight 7) against the human-segmentation masks;
* detection params (steps + alt_img_stem + det_top) step on the
  distillation BCE keypoint-mining loss (pos_weight 100, alpha 0.8);
* the frozen stem + mid_stem receive no updates (torch skips params
  with ``grad=None``);
* both groups use SGD(momentum .9, wd 3e-4) under an SGDR schedule.

In the reference this takes two sequential backwards; here one backward
computes both gradient sets exactly (the model's ``detach_att_for_det``
blocks the det-loss->attention leak that torch computes but never
applies), so the whole step is a single XLA program.  Data parallelism
comes from sharding the batch over the mesh ``data`` axis — XLA inserts
the gradient all-reduce.
"""

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

from ..ops.resize import resize_bilinear
from .losses import bce_with_logits, distillation_bce_loss_keypoint_mining
from .schedules import SgdrConfig, sgdr_schedule


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    """Hyperparameters, defaults from ``distillation.py:36-101``."""

    distillation_alpha: float = 0.8
    det_pos_weight: float = 100.0
    att_pos_weight: float = 7.0
    background_factor: float = 1.0
    momentum: float = 0.9
    weight_decay: float = 0.0003
    att_sgdr: SgdrConfig = SgdrConfig()
    det_sgdr: SgdrConfig = SgdrConfig()
    # attention-divisor decay (DecayingDivisor, distillation.py:103-121)
    att_div_initial: float = 20.0
    att_div_decay: float = 0.001


ATT_PREFIXES = ("att", "att_top")
DET_PREFIXES = ("alt_stem_conv0", "alt_stem_bn0", "alt_stem_conv1",
                "alt_stem_bn1", "step0", "step1", "step2", "det_top")


def label_params(params: Dict) -> Dict:
    """'att' / 'det' / 'frozen' label tree for optax.multi_transform."""
    flat = flatten_dict(params)
    labels = {}
    for path in flat:
        top = path[0]
        if top in ATT_PREFIXES:
            labels[path] = "att"
        elif top in DET_PREFIXES:
            labels[path] = "det"
        else:
            labels[path] = "frozen"
    return unflatten_dict(labels)


def _sgd(schedule, momentum, weight_decay):
    """torch-SGD semantics: grad + wd*p, then momentum buffer, then lr."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )


def make_distill_optimizer(cfg: DistillConfig):
    att_sched = sgdr_schedule(cfg.att_sgdr)
    det_sched = sgdr_schedule(cfg.det_sgdr)
    tx = optax.multi_transform(
        {"att": _sgd(att_sched, cfg.momentum, cfg.weight_decay),
         "det": _sgd(det_sched, cfg.momentum, cfg.weight_decay),
         "frozen": optax.set_to_zero()},
        label_params)
    return tx, att_sched, det_sched


class DistillTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: Dict, cfg: DistillConfig):
        tx, _, _ = make_distill_optimizer(cfg)
        return cls(step=jnp.zeros((), jnp.int32),
                   params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]))


def att_divisor_at(step, cfg: DistillConfig):
    """1 + v0 * exp(-decay * step) (``distillation.py:116-121``)."""
    return 1.0 + cfg.att_div_initial * jnp.exp(
        -cfg.att_div_decay * step.astype(jnp.float32))


def make_distill_train_step(model, cfg: DistillConfig,
                            grad_accum: int = 1,
                            bn_dtype=None,
                            donate: bool = False):
    """Build the jitted train step.

    ``batch`` dict (NHWC, fixed shapes): ``img`` (B,H,W,3) normalized,
    ``img_alt`` (B,H,W,3), ``segm_mask`` (B,H,W,1), ``gt_hms``
    (B,H,W,17), ``teacher_hms`` (B,H,W,17), ``mask`` (B,H,W,1).
    Targets are resized to the prediction resolution inside the step
    (reference ``distillation.py:315-324``).

    :param grad_accum: with N > 1 the batch is split into N equal
      microbatches scanned sequentially; gradients are averaged (exactly
      the mean of the per-microbatch gradients — asserted in
      ``tests/test_train.py``) and ONE optimizer update is applied, so a
      bs-B/N pipeline trains at an effective batch of B.  BatchNorm
      batch statistics are per-microbatch (the standard accumulation
      semantics; a full-batch step normalizes over all B at once).
    :param bn_dtype: BatchNorm COMPUTE dtype inside the step (batch
      statistics stay fp32 either way — flax's
      ``force_float32_reductions``).  The step is HBM-bound at fp32
      (91.7% of peak bandwidth at 15.4% of peak compute,
      BENCH_r03.json): every BN materializes its region of the graph
      — and its backward cotangents — in fp32 while the convs run
      bf16.  ``jnp.bfloat16`` halves that traffic; parity against the
      reference's fp32-BN-in-fp16-model policy
      (``fp16_utils/fp16util.py:71-91``) keeps ``None`` (fp32) the
      default.  Accuracy: ``tests/test_train.py`` trains both and
      checks loss-curve agreement.
    :param donate: donate the state argument so XLA reuses the
      params/optimizer buffers in place (serving no purpose on CPU,
      where donation is unimplemented; the training scripts pass True).
    """
    tx, att_sched, det_sched = make_distill_optimizer(cfg)
    from ..models.layers import bn_compute_dtype

    def loss_fn(params, batch_stats, step, batch):
        with bn_compute_dtype(bn_dtype):
            (att, det), mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["img"], batch["img_alt"],
                att_divisor=att_divisor_at(step, cfg),
                train=True, mutable=["batch_stats"])
        att_hw = att.shape[1:3]
        det_hw = det.shape[1:3]
        segm = resize_bilinear(batch["segm_mask"], att_hw,
                               align_corners=False)
        gt = resize_bilinear(batch["gt_hms"], det_hw,
                             align_corners=False)
        teacher = resize_bilinear(batch["teacher_hms"], det_hw,
                                  align_corners=False)
        mask = resize_bilinear(batch["mask"], det_hw,
                               align_corners=False)
        mask = jnp.broadcast_to(mask, gt.shape)
        # quirk preserved: the reference feeds the *sigmoided*
        # attention map to BCEWithLogits (distillation.py:201-202,326)
        seg_loss = bce_with_logits(att, segm, cfg.att_pos_weight)
        det_loss = distillation_bce_loss_keypoint_mining(
            det, teacher, gt,
            alpha=cfg.distillation_alpha, mask=mask,
            background_factor=cfg.background_factor,
            teacher_pos_weight=cfg.det_pos_weight,
            gt_pos_weight=cfg.det_pos_weight)
        total = seg_loss + det_loss
        return total, (seg_loss, det_loss, mut["batch_stats"])

    grad_fn = jax.grad(loss_fn, has_aux=True)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: DistillTrainState, batch: Dict
                   ) -> Tuple[DistillTrainState, Dict]:
        if grad_accum == 1:
            grads, (seg_loss, det_loss, new_stats) = grad_fn(
                state.params, state.batch_stats, state.step, batch)
        else:
            b = batch["img"].shape[0]
            assert b % grad_accum == 0, (b, grad_accum)
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((grad_accum, b // grad_accum)
                                    + x.shape[1:]), batch)

            def body(carry, mb):
                stats, acc = carry
                g, (seg, det, new_stats) = grad_fn(
                    state.params, stats, state.step, mb)
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
                return (new_stats, acc), (seg, det)

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            (new_stats, acc), (segs, dets) = jax.lax.scan(
                body, (state.batch_stats, zeros), micro)
            grads = jax.tree_util.tree_map(
                lambda g: g / grad_accum, acc)
            seg_loss = jnp.mean(segs)
            det_loss = jnp.mean(dets)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "attention_loss": seg_loss,
            "keypoints_loss": det_loss,
            "att_lr": att_sched(state.step),
            "det_lr": det_sched(state.step),
        }
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats,
                             opt_state=new_opt_state), metrics

    return train_step
