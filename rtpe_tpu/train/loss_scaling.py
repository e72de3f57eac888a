"""Loss scaling (static + dynamic), optax-composable.

bf16 training on TPU does not need loss scaling (SURVEY.md §2.5) — this
module exists for capability parity with the reference's fp16 machinery
(``rtpe/third_party/fp16_utils/loss_scaler.py``): a static scaler and a
dynamic scaler that starts at 2^32, halves on inf/nan gradients
(skipping the step), and doubles after 1000 clean steps.

Usage::

    tx = optax.chain(scale_by_loss_unscaling(scaler_state_init), sgd)
    # scale the loss by ``state.scale`` before grad; this transform
    # unscales gradients and zeroes the update on overflow.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class DynamicScalerState(NamedTuple):
    scale: jax.Array          # current loss scale
    good_steps: jax.Array     # consecutive overflow-free steps


def init_dynamic_scaler(init_scale: float = 2.0 ** 32
                        ) -> DynamicScalerState:
    return DynamicScalerState(scale=jnp.float32(init_scale),
                              good_steps=jnp.int32(0))


def has_overflow(grads) -> jax.Array:
    """True if any gradient entry is non-finite (reference
    ``loss_scaler.py:127-145``)."""
    leaves = jax.tree_util.tree_leaves(grads)
    flags = [jnp.any(~jnp.isfinite(g.astype(jnp.float32)))
             for g in leaves]
    return jnp.any(jnp.stack(flags)) if flags else jnp.bool_(False)


def update_scaler(state: DynamicScalerState, overflow: jax.Array,
                  scale_window: int = 1000, scale_factor: float = 2.0,
                  min_scale: float = 1.0) -> DynamicScalerState:
    """Reference dynamics (``loss_scaler.py:145-167``): halve (floored)
    on overflow and reset the window; double every ``scale_window``
    clean steps."""
    new_scale = jnp.where(
        overflow,
        jnp.maximum(state.scale / scale_factor, min_scale),
        jnp.where(state.good_steps + 1 >= scale_window,
                  state.scale * scale_factor, state.scale))
    new_good = jnp.where(overflow | (state.good_steps + 1 >= scale_window),
                         0, state.good_steps + 1)
    return DynamicScalerState(scale=new_scale,
                              good_steps=new_good.astype(jnp.int32))


def scaled_grads_or_skip(grads, state: DynamicScalerState):
    """Unscale gradients; zero them on overflow (skip-step semantics of
    ``fp16_optimizer.py:369-375``).

    :returns: (unscaled-or-zero grads, new scaler state, overflow flag)
    """
    overflow = has_overflow(grads)
    inv = 1.0 / state.scale
    grads = jax.tree_util.tree_map(
        lambda g: jnp.where(overflow, jnp.zeros_like(g, jnp.float32),
                            g.astype(jnp.float32) * inv), grads)
    return grads, update_scaler(state, overflow), overflow


class StaticScaler:
    """Reference static scaler (``loss_scaler.py:45-78``): constant
    scale, overflow never checked."""

    def __init__(self, scale: float = 1.0):
        self.scale = scale

    def scale_loss(self, loss):
        return loss * self.scale

    def unscale_grads(self, grads):
        if self.scale == 1.0:
            return grads
        inv = 1.0 / self.scale
        return jax.tree_util.tree_map(lambda g: g * inv, grads)
