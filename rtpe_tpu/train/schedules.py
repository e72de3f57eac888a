"""SGDR — cosine annealing with warm restarts and per-cycle rescaling.

Closed-form optax-compatible schedule reproducing the reference
``SgdrScheduler`` (``rtpe/optimization.py:43-108``): a cosine from
``max_lr`` to ``min_lr`` over ``period`` steps; at every restart
``max_lr/min_lr/period`` are multiplied by their scale factors.  The
reference mutates python state per step; here the cycle index is
recovered in closed form so the schedule is a pure function of the step
(jit/pjit friendly).
"""

import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SgdrConfig:
    """Defaults mirror ``distillation.py:83-88``."""

    max_lr: float = 0.025
    min_lr: float = 0.003
    period: float = 700.0
    scale_max_lr: float = 1.02
    scale_min_lr: float = 1.0
    scale_period: float = 1.01


def sgdr_schedule(cfg: SgdrConfig):
    """Return ``f(step) -> lr`` usable as an optax schedule."""

    p0 = float(cfg.period)
    s = float(cfg.scale_period)

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        if abs(s - 1.0) < 1e-9:
            k = jnp.floor(t / p0)
            boundary = k * p0
            period_k = p0
        else:
            # cumulative boundary of cycle k: p0 * (s^k - 1) / (s - 1)
            k = jnp.floor(
                jnp.log1p(t * (s - 1.0) / p0) / math.log(s))
            k = jnp.maximum(k, 0.0)
            boundary = p0 * (jnp.power(s, k) - 1.0) / (s - 1.0)
            # float-edge guard: if t fell before the boundary, step back
            k = jnp.where(boundary > t, k - 1.0, k)
            boundary = p0 * (jnp.power(s, k) - 1.0) / (s - 1.0)
            period_k = p0 * jnp.power(s, k)
        tau = t - boundary
        max_k = cfg.max_lr * jnp.power(cfg.scale_max_lr, k)
        min_k = cfg.min_lr * jnp.power(cfg.scale_min_lr, k)
        cos = jnp.cos(jnp.pi * jnp.clip(tau / period_k, 0.0, 1.0))
        return min_k + (max_k - min_k) * (1.0 + cos) / 2.0

    return schedule
