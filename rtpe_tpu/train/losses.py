"""Loss functions, numerics-compatible with ``rtpe/optimization.py``.

All losses are pure jnp functions over NHWC arrays, computed in fp32.

* :func:`masked_mse` — MSE of mask-multiplied inputs (:114-133)
* :func:`masked_bce_with_logits` — BCE-with-logits of mask-multiplied
  inputs with ``pos_weight`` (:136-153); note the reference multiplies
  the *logits* by the mask, quirk preserved
* :func:`distillation_loss` — ``alpha*L(student, teacher) +
  (1-alpha)*L(student, gt)`` (:156-182)
* keypoint-mining variants (:185-257): background (gt==0) mask scaling
  and, for the BCE variant, min-max normalization of gt/teacher maps
"""

from typing import Optional

import jax
import jax.numpy as jnp


def masked_mse(pred: jax.Array, gt: jax.Array,
               mask: Optional[jax.Array] = None) -> jax.Array:
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if mask is not None:
        mask = mask.astype(jnp.float32)
        pred = pred * mask
        gt = gt * mask
    return jnp.mean((pred - gt) ** 2)


def bce_with_logits(logits: jax.Array, targets: jax.Array,
                    pos_weight: float = 1.0) -> jax.Array:
    """torch ``BCEWithLogitsLoss``: mean of
    ``-[w*y*log σ(x) + (1-y)*log(1-σ(x))]`` with the numerically stable
    log-sigmoid formulation."""
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    log_sig = jax.nn.log_sigmoid(x)
    log_one_minus = jax.nn.log_sigmoid(-x)
    loss = -(pos_weight * y * log_sig + (1.0 - y) * log_one_minus)
    return jnp.mean(loss)


def masked_bce_with_logits(pred: jax.Array, gt: jax.Array,
                           mask: Optional[jax.Array] = None,
                           pos_weight: float = 1.0) -> jax.Array:
    if mask is not None:
        mask = mask.astype(jnp.float32)
        pred = pred.astype(jnp.float32) * mask  # quirk: masks the logits
        gt = gt.astype(jnp.float32) * mask
    return bce_with_logits(pred, gt, pos_weight)


def distillation_loss(student_pred, teacher_pred, gt, alpha=0.5, mask=None):
    """MSE flavour (reference ``DistillationLoss.forward``)."""
    t = masked_mse(student_pred, teacher_pred, mask)
    g = masked_mse(student_pred, gt, mask)
    return alpha * t + (1.0 - alpha) * g


def mining_mask(gt: jax.Array, mask: jax.Array,
                background_factor: float) -> jax.Array:
    """Scale the mask where gt == 0 (keypoint mining,
    ``optimization.py:199-202``)."""
    gt = gt.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    return jnp.where(gt == 0, mask * background_factor, mask)


def distillation_loss_keypoint_mining(student_pred, teacher_pred, gt,
                                      alpha=0.5, mask=None,
                                      background_factor=0.0):
    if mask is not None:
        mask = mining_mask(gt, mask, background_factor)
    return distillation_loss(student_pred, teacher_pred, gt, alpha, mask)


def _minmax_normalize(x: jax.Array) -> jax.Array:
    """Sequential shift-then-scale of ``optimization.py:238-246``."""
    x = x.astype(jnp.float32)
    xmin = jnp.min(x)
    x = jnp.where(xmin < 0, x - xmin, x)
    xmax = jnp.max(x)
    x = jnp.where(xmax > 1, x / xmax, x)
    return x


def distillation_bce_loss_keypoint_mining(student_pred, teacher_pred, gt,
                                          alpha=0.5, mask=None,
                                          background_factor=0.0,
                                          teacher_pos_weight=1.0,
                                          gt_pos_weight=1.0):
    """The detection loss of ``distillation.py:200,331-336``."""
    gt = jax.lax.stop_gradient(_minmax_normalize(gt))
    teacher_pred = jax.lax.stop_gradient(_minmax_normalize(teacher_pred))
    if mask is not None:
        mask = jax.lax.stop_gradient(
            mining_mask(gt, mask, background_factor))
    t = masked_bce_with_logits(student_pred, teacher_pred, mask,
                               teacher_pos_weight)
    g = masked_bce_with_logits(student_pred, gt, mask, gt_pos_weight)
    return alpha * t + (1.0 - alpha) * g
