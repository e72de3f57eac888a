"""HRNet residual blocks and the HighResolutionModule, as Flax modules.

Re-designed from the behavior of the reference torch classes
(``rtpe/third_party/pose_higher_hrnet.py``): ``BasicBlock`` (:46),
``Bottleneck`` (:78) and ``HighResolutionModule`` (:119-256).  Layout is
NHWC; fuse-layer upsampling is the exact torch ``nearest`` repeat.
"""

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import upsample_nearest
from .layers import batch_norm, conv

Dtype = Any


class BasicBlock(nn.Module):
    """3x3 conv-bn-relu ×2 with identity (or projected) residual."""

    expansion = 1

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        out = conv(self.planes, 3, self.stride, 1, dtype=self.dtype,
                   name="conv1")(x)
        out = batch_norm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out.astype(self.dtype))
        out = conv(self.planes, 3, 1, 1, dtype=self.dtype, name="conv2")(out)
        out = batch_norm(name="bn2")(out, use_running_average=not train)
        if self.downsample:
            residual = conv(self.planes, 1, self.stride, 0, dtype=self.dtype,
                            name="downsample_conv")(x)
            residual = batch_norm(name="downsample_bn")(
                residual, use_running_average=not train)
        out = out.astype(jnp.float32) + residual.astype(jnp.float32)
        return nn.relu(out).astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(×4) bottleneck with residual."""

    expansion = 4

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        out = conv(self.planes, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out.astype(self.dtype))
        out = conv(self.planes, 3, self.stride, 1, dtype=self.dtype,
                   name="conv2")(out)
        out = batch_norm(name="bn2")(out, use_running_average=not train)
        out = nn.relu(out.astype(self.dtype))
        out = conv(self.planes * 4, 1, 1, 0, dtype=self.dtype,
                   name="conv3")(out)
        out = batch_norm(name="bn3")(out, use_running_average=not train)
        if self.downsample:
            residual = conv(self.planes * 4, 1, self.stride, 0,
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = batch_norm(name="downsample_bn")(
                residual, use_running_average=not train)
        out = out.astype(jnp.float32) + residual.astype(jnp.float32)
        return nn.relu(out).astype(self.dtype)


BLOCK_TYPES = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


class HighResolutionModule(nn.Module):
    """Parallel multi-resolution branches with full cross-scale fusion.

    ``num_inchannels`` are the per-branch input channel counts; with the
    BASIC block they also equal the output counts.  When
    ``multi_scale_output`` is false only the highest-resolution fused
    output is produced (reference :190-256).
    """

    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_inchannels: Sequence[int]
    num_channels: Sequence[int]
    multi_scale_output: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array],
                 train: bool = False) -> Tuple[jax.Array, ...]:
        block_cls = BLOCK_TYPES[self.block]
        exp = block_cls.expansion
        out_channels = [c * exp for c in self.num_channels]

        # branches
        ys = []
        for i in range(self.num_branches):
            x = xs[i]
            for j in range(self.num_blocks[i]):
                needs_ds = (j == 0
                            and self.num_inchannels[i] != out_channels[i])
                x = block_cls(self.num_channels[i], 1, needs_ds,
                              dtype=self.dtype,
                              name=f"branch{i}_{j}")(x, train)
            ys.append(x)

        if self.num_branches == 1:
            return (ys[0],)

        # fuse
        num_out = self.num_branches if self.multi_scale_output else 1
        fused = []
        for i in range(num_out):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    y = ys[j]
                elif j > i:
                    # 1x1 conv + BN + nearest x2^(j-i) upsample
                    y = conv(out_channels[i], 1, 1, 0, dtype=self.dtype,
                             name=f"fuse{i}_{j}_conv")(ys[j])
                    y = batch_norm(name=f"fuse{i}_{j}_bn")(
                        y, use_running_average=not train)
                    y = upsample_nearest(y.astype(self.dtype), 2 ** (j - i))
                else:
                    # chain of strided 3x3 convs downsampling 2^(i-j)
                    y = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        feats = out_channels[i] if last else out_channels[j]
                        y = conv(feats, 3, 2, 1, dtype=self.dtype,
                                 name=f"fuse{i}_{j}_{k}_conv")(y)
                        y = batch_norm(name=f"fuse{i}_{j}_{k}_bn")(
                            y, use_running_average=not train)
                        y = y.astype(self.dtype)
                        if not last:
                            y = nn.relu(y)
                acc = y.astype(jnp.float32) if acc is None \
                    else acc + y.astype(jnp.float32)
            fused.append(nn.relu(acc).astype(self.dtype))
        return tuple(fused)
