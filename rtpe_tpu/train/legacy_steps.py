"""Train steps for the non-attention student family.

The reference's legacy scripts each pair one student with one loss
(SURVEY.md §2.3): ``RefinerStudent``/``MultistageStudent`` with the MSE
``DistillationLoss`` (``legacy/distillation_refiner_student.py``,
``legacy/distillation_multistage_student.py``) and ``CamStudent`` with
``DistillationLossKeypointMining`` at ``background_factor=0.01``
(``legacy/distillation_pcr.py:278``).  One generic step covers the
family: single-output students train on the final map; multi-output
students get intermediate supervision (loss summed over stages).
"""

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

from ..ops.resize import resize_bilinear
from .losses import distillation_loss_keypoint_mining
from .schedules import SgdrConfig, sgdr_schedule


@dataclasses.dataclass(frozen=True)
class StudentDistillConfig:
    distillation_alpha: float = 0.5
    background_factor: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 0.0003
    sgdr: SgdrConfig = SgdrConfig()


def _student_labels(params: Dict) -> Dict:
    """Stem frozen, everything else trains (the legacy scripts train
    all non-stem params with one optimizer)."""
    flat = flatten_dict(params)
    return unflatten_dict({
        p: ("frozen" if p[0] == "stem" else "train") for p in flat})


class StudentTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # optional fp16-style dynamic loss scaler state (None when unused —
    # bf16 needs no scaling; this is the reference FP16_Optimizer path,
    # fp16_utils/loss_scaler.py, wired for capability parity)
    scaler: Any = None

    @classmethod
    def create(cls, variables: Dict, cfg: StudentDistillConfig,
               dynamic_loss_scale: bool = False,
               init_scale: float = 2.0 ** 15):
        from .loss_scaling import init_dynamic_scaler
        tx = _make_tx(cfg)
        return cls(step=jnp.zeros((), jnp.int32),
                   params=variables["params"],
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(variables["params"]),
                   scaler=(init_dynamic_scaler(init_scale)
                           if dynamic_loss_scale else None))


def _make_tx(cfg: StudentDistillConfig):
    sched = sgdr_schedule(cfg.sgdr)
    sgd = optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_learning_rate(sched),
    )
    return optax.multi_transform(
        {"train": sgd, "frozen": optax.set_to_zero()}, _student_labels)


def make_student_train_step(model, cfg: StudentDistillConfig,
                            out_hw: Tuple[int, int] = None,
                            dynamic_loss_scale: bool = False):
    """Build a jitted step for Refiner/Multistage/Cam students.

    ``batch``: ``img`` (B,H,W,3), ``gt_hms`` (B,H,W,C), ``teacher_hms``
    (B,H,W,C), ``mask`` (B,H,W,1); C = num_heatmaps (+ae channels when
    the targets carry them).

    ``dynamic_loss_scale`` reproduces the reference FP16_Optimizer
    semantics (``fp16_utils/fp16_optimizer.py`` + ``loss_scaler.py``):
    the loss is multiplied by the scaler's power-of-two scale before the
    backward pass, gradients are unscaled (exact — power-of-two), and on
    any non-finite gradient the whole optimizer update (params AND
    momentum) is skipped while the scale halves; after 1000 clean steps
    it doubles.  The state must be created with
    ``StudentTrainState.create(..., dynamic_loss_scale=True)``.
    bf16 on TPU shares fp32's exponent range, so this is parity
    machinery, not a numerical necessity (SURVEY.md §2.5).
    """
    tx = _make_tx(cfg)
    sched = sgdr_schedule(cfg.sgdr)

    @jax.jit
    def train_step(state: StudentTrainState, batch: Dict):
        def loss_fn(params):
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["img"], out_hw=out_hw, train=True,
                mutable=["batch_stats"])
            outs = out if isinstance(out, (tuple, list)) else (out,)
            total = jnp.float32(0.0)
            for pred in outs:
                hw = pred.shape[1:3]
                gt = resize_bilinear(batch["gt_hms"], hw,
                                     align_corners=False)
                teacher = resize_bilinear(batch["teacher_hms"], hw,
                                          align_corners=False)
                mask = resize_bilinear(batch["mask"], hw,
                                       align_corners=False)
                c = pred.shape[-1]
                total = total + distillation_loss_keypoint_mining(
                    pred, teacher[..., :c], gt[..., :c],
                    alpha=cfg.distillation_alpha,
                    mask=jnp.broadcast_to(mask, gt[..., :c].shape),
                    background_factor=cfg.background_factor)
            return total, mut["batch_stats"]

        if dynamic_loss_scale:
            from .loss_scaling import has_overflow, update_scaler

            scale = state.scaler.scale

            def scaled_loss_fn(params):
                loss, stats = loss_fn(params)
                return loss * scale, (loss, stats)

            (_, (loss, new_stats)), grads = jax.value_and_grad(
                scaled_loss_fn, has_aux=True)(state.params)
            grads = jax.tree_util.tree_map(lambda g: g / scale, grads)
            overflow = has_overflow(grads)
            safe = jax.tree_util.tree_map(
                lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
            updates, new_opt = tx.update(safe, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            # skip the whole update (params AND momentum) on overflow —
            # but NOT the LR-schedule step count: the reference steps
            # its SgdrScheduler every iteration while FP16_Optimizer
            # skips only the optimizer update, so the schedule must
            # advance through overflow steps too.  Integer opt-state
            # leaves are exactly the schedule counts; float leaves are
            # the momentum/trace buffers.
            def keep(old, new):
                return jax.tree_util.tree_map(
                    lambda a, b: b if jnp.issubdtype(b.dtype, jnp.integer)
                    else jnp.where(overflow, a, b), old, new)
            new_params = jax.tree_util.tree_map(
                lambda a, b: jnp.where(overflow, a, b),
                state.params, new_params)
            new_opt = keep(state.opt_state, new_opt)
            new_scaler = update_scaler(state.scaler, overflow)
            metrics = {"loss": loss, "lr": sched(state.step),
                       "loss_scale": new_scaler.scale,
                       "overflow": overflow.astype(jnp.float32)}
            return state.replace(step=state.step + 1, params=new_params,
                                 batch_stats=new_stats,
                                 opt_state=new_opt,
                                 scaler=new_scaler), metrics

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "lr": sched(state.step)}
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_stats,
                             opt_state=new_opt), metrics

    return train_step
