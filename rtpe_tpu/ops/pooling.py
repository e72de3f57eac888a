"""Pooling ops matching torch semantics (NHWC).

* ``max_pool`` — torch ``nn.MaxPool2d(k, s, p)``; used by the NMS decode
  step (reference ``rtpe/third_party/group.py:132-138``).
* ``avg_pool`` with ``count_include_pad=False`` — used by the attention /
  detection pyramids (reference ``rtpe/students.py:656-699,873-887``).
* ``global_avg_pool`` — torch ``nn.AdaptiveAvgPool2d(1)`` in the SE layer
  (reference ``rtpe/students.py:126``).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnames=("ksize", "stride", "padding"))
def max_pool(x: jax.Array, ksize: int, stride: int = 1, padding: int = 0):
    """NHWC max pool; pads with -inf like torch."""
    # NOTE: the init value must be a python literal — a traced/array init
    # blocks lowering to reduce_window_max and with it autodiff support.
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) \
        else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


@partial(jax.jit,
         static_argnames=("ksize", "stride", "padding", "count_include_pad"))
def avg_pool(x: jax.Array, ksize: int, stride: int = 1, padding: int = 0,
             count_include_pad: bool = False):
    """NHWC average pool with torch's ``count_include_pad`` options."""
    dtype = x.dtype
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    if count_include_pad:
        count = float(ksize * ksize)
        return (summed / count).astype(dtype)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), dtype=jnp.float32)
    count = lax.reduce_window(
        ones, 0.0, lax.add,
        window_dimensions=(1, ksize, ksize, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return (summed / count).astype(dtype)


def global_avg_pool(x: jax.Array):
    """(B, H, W, C) -> (B, C) mean over spatial dims, fp32 accumulation."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
