"""Frozen HRNet stem shared by all students.

Behavioral copy of the reference ``StemHRNet`` (``rtpe/students.py:206-295``):
two stride-2 3x3 convs to 64ch followed by four Bottlenecks to 256ch at
1/4 resolution.  Submodule names match the teacher stem so that the same
torch-weight importer path loads either (the reference loads the stem by
filtering the teacher statedict with the fp16-wrapper ``"1."`` prefix,
``rtpe/students.py:274-277``).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Bottleneck
from .layers import batch_norm, conv

Dtype = Any

STEM_OUT_CHANS = 256


class StemHRNet(nn.Module):
    """(B, H, W, 3) -> (B, H/4, W/4, 256)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        x = conv(64, 3, 2, 1, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x.astype(self.dtype))
        x = conv(64, 3, 2, 1, dtype=self.dtype, name="conv2")(x)
        x = batch_norm(name="bn2")(x, use_running_average=not train)
        x = nn.relu(x.astype(self.dtype))
        for i in range(4):
            x = Bottleneck(64, 1, i == 0, dtype=self.dtype,
                           name=f"layer1_{i}")(x, train)
        return x
