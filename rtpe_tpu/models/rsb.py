"""Residual Step Block (RSN), Flax build.

Behavioral re-implementation of the live part of
``rtpe/third_party/RSB.py:54-137``: a 1x1 expansion to four branch
groups, dense intra-scale step aggregation (branch i at depth d mixes
branch i-1's depth-d output), concat, 1x1 projection, residual.  The
reference's ``checkpoint`` flag maps to ``jax.checkpoint``
rematerialization.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import batch_norm, conv

Dtype = Any


class ConvBnRelu(nn.Module):
    features: int
    ksize: int = 3
    stride: int = 1
    padding: int = 1
    has_bn: bool = True
    has_relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # reference conv_bn_relu uses bias=True convs (RSB.py:22-24)
        x = conv(self.features, self.ksize, self.stride, self.padding,
                 bias=True, dtype=self.dtype, name="conv")(x)
        if self.has_bn:
            x = batch_norm(name="bn")(x, use_running_average=not train)
            x = x.astype(self.dtype)
        if self.has_relu:
            x = nn.relu(x)
        return x


class ResidualStepBlock(nn.Module):
    """(B, H, W, C_in) -> (B, H, W, planes); residual requires
    C_in == planes (or pass ``downsample=True`` for a 1x1 projection)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    # memory/compute trade: wrap the call in jax.checkpoint externally
    # for the reference's gradient-checkpoint option (RSB.py:44-47)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_planes = x.shape[-1]
        branch_ch = in_planes * 26 // 64

        out = ConvBnRelu(4 * branch_ch, ksize=1, stride=self.stride,
                         padding=0, dtype=self.dtype,
                         name="expand")(x, train)
        s0 = out[..., 0 * branch_ch:1 * branch_ch]
        s1 = out[..., 1 * branch_ch:2 * branch_ch]
        s2 = out[..., 2 * branch_ch:3 * branch_ch]
        s3 = out[..., 3 * branch_ch:4 * branch_ch]

        def step(name):
            return ConvBnRelu(branch_ch, dtype=self.dtype, name=name)

        o11 = step("b1_1")(s0, train)
        o21 = step("b2_1")(s1 + o11, train)
        o22 = step("b2_2")(o21, train)
        o31 = step("b3_1")(s2 + o21, train)
        o32 = step("b3_2")(o31 + o22, train)
        o33 = step("b3_3")(o32, train)
        o41 = step("b4_1")(s3 + o31, train)
        o42 = step("b4_2")(o41 + o32, train)
        o43 = step("b4_3")(o42 + o33, train)
        o44 = step("b4_4")(o43, train)

        out = jnp.concatenate([o11, o22, o33, o44], axis=-1)
        out = ConvBnRelu(self.planes, ksize=1, padding=0, has_relu=False,
                         dtype=self.dtype, name="project")(out, train)

        residual = x
        if self.downsample:
            residual = conv(self.planes, 1, self.stride, 0, bias=True,
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = batch_norm(name="downsample_bn")(
                residual, use_running_average=not train).astype(self.dtype)
        out = out.astype(jnp.float32) + residual.astype(jnp.float32)
        return nn.relu(out).astype(self.dtype)
