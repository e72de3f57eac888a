"""Pallas fused BasicBlock chains: a whole residual stage per dispatch.

On the HRNet's lower-resolution branches ((80,80,96), (40,40,192),
(20,20,384) at bs16@640) the XLA per-conv path runs at ~34 TFLOP/s —
each 3x3 conv is a separate HBM round trip of a tensor small enough to
live in VMEM whole.  This kernel keeps ONE IMAGE's activation resident
in VMEM across an entire chain of BasicBlocks (conv-bias-relu,
conv-bias, +residual, relu — the folded-BN semantics of
``models/hrnet_packed._basic_block``), reading the input from HBM once
and writing the output once; the 3x3 convs run as 9 shifted MXU
contractions.

Used by the row-packed serving forward for branch 1..3 block chains
(``models/hrnet_packed.py``); equality with the unfused ops is asserted
in ``tests/test_pallas_blocks.py``.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_vmem(x, w, h, wdt, c, k):
    """x (H, W, C) bf16 in VMEM, w (3, 3, C, K) -> (H, W, K) f32.

    Zero 'same' padding; 9 shifted (H*W, C) @ (C, K) MXU contractions.
    """
    zrow = jnp.zeros((1, wdt, c), x.dtype)
    zcol = jnp.zeros((h + 2, 1, c), x.dtype)
    xp = jnp.concatenate([zrow, x, zrow], axis=0)
    xp = jnp.concatenate([zcol, xp, zcol], axis=1)
    acc = jnp.zeros((h * wdt, k), jnp.float32)
    for di in range(3):
        for dj in range(3):
            patch = xp[di:di + h, dj:dj + wdt, :].reshape(h * wdt, c)
            acc = acc + jax.lax.dot_general(
                patch, w[di, dj],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(h, wdt, k)


def _chain_kernel(x_ref, w_ref, b_ref, out_ref, *, n_blocks, h, wdt, c):
    x = x_ref[0]
    for i in range(n_blocks):
        y = _conv3x3_vmem(x, w_ref[i, 0], h, wdt, c, c)
        y = jnp.maximum(y + b_ref[i, 0], 0.0).astype(x.dtype)
        y = _conv3x3_vmem(y, w_ref[i, 1], h, wdt, c, c)
        y = (y + b_ref[i, 1]).astype(x.dtype)
        x = jnp.maximum(y + x, 0.0)
    out_ref[0] = x


@functools.partial(jax.jit, static_argnames=("interpret",))
def basicblock_chain(x, weights, biases, interpret: bool = False):
    """Run ``n`` BasicBlocks over ``x`` in one fused kernel.

    :param x: (B, H, W, C) bf16 activations.
    :param weights: (n, 2, 3, 3, C, C) bf16 folded-BN conv kernels.
    :param biases: (n, 2, C) float32 folded-BN biases.
    :returns: (B, H, W, C) bf16, identical to applying
      ``relu(conv2(relu(conv1(x)+b1))+b2 + x)`` n times with f32
      accumulation and bf16 inter-op casts.
    """
    b, h, wdt, c = x.shape
    n_blocks = weights.shape[0]
    kernel = functools.partial(_chain_kernel, n_blocks=n_blocks,
                               h=h, wdt=wdt, c=c)
    flops = 2 * b * h * wdt * 9 * c * c * 2 * n_blocks
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 2, 3, 3, c, c),
                         lambda i: (0, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 2, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=x.size * 2 * 2 + weights.size * 2),
        compiler_params=pltpu.CompilerParams(
            # one image + chain weights + f32 accumulators; v5e has
            # 128 MB VMEM, the 16 MB default scoped limit is too tight
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, weights, biases)
