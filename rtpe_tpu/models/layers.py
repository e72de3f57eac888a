"""Low-level Flax layers with exact torch numerical semantics.

All convolutions run NHWC with HWIO kernels (the MXU-native layout);
parameters are stored fp32 (``param_dtype``) and computed in the module's
``dtype`` (bf16 on TPU by default).  BatchNorm always computes in fp32 —
the bf16 analog of the reference's fp16-model/fp32-BN policy
(``rtpe/third_party/fp16_utils/fp16util.py:71-91``).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

BN_MOMENTUM_TORCH = 0.1  # reference pose_higher_hrnet.py:36
BN_EPS = 1e-5


def torch_bn_momentum(torch_momentum: float = BN_MOMENTUM_TORCH) -> float:
    """torch momentum m means running = (1-m)*running + m*batch; flax
    momentum is the (1-m) factor."""
    return 1.0 - torch_momentum


def conv(features: int, ksize: int = 3, stride: int = 1, padding: int = 0,
         dilation: int = 1, bias: bool = False, dtype: Dtype = jnp.float32,
         name: str = None) -> nn.Conv:
    """torch ``nn.Conv2d`` equivalent (explicit symmetric padding)."""
    return nn.Conv(
        features=features,
        kernel_size=(ksize, ksize),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        kernel_dilation=(dilation, dilation),
        use_bias=bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


# BatchNorm compute dtype. fp32 is the parity default (the bf16 analog
# of the reference's fp32-BN-in-fp16-model policy).  Setting bf16 via
# :func:`set_bn_compute_dtype` keeps BN *statistics/params* fp32 but
# computes the normalization in bf16, removing fp32 materialization
# between conv and BN on the memory-bound HRNet trunk.  Heatmap outputs
# shift within bf16 tolerance; AP-irrelevant, parity-tests-relevant —
# leave fp32 when comparing against torch.
_BN_COMPUTE_DTYPE = jnp.float32


def set_bn_compute_dtype(dtype) -> None:
    global _BN_COMPUTE_DTYPE
    _BN_COMPUTE_DTYPE = dtype


class bn_compute_dtype:
    """Context manager scoping the BN compute dtype to one trace.

    flax reads the global when ``batch_norm()`` constructs during
    ``nn.compact`` tracing, so wrapping ``model.apply`` (or its jit
    trace) is sufficient and leaves the process-wide parity default
    untouched.  flax computes the batch STATISTICS in fp32 regardless
    (``force_float32_reductions``); only the normalization arithmetic
    and the materialized output change width."""

    def __init__(self, dtype):
        self.dtype = dtype

    def __enter__(self):
        global _BN_COMPUTE_DTYPE
        self._old = _BN_COMPUTE_DTYPE
        if self.dtype is not None:
            _BN_COMPUTE_DTYPE = self.dtype
        return self

    def __exit__(self, *exc):
        global _BN_COMPUTE_DTYPE
        _BN_COMPUTE_DTYPE = self._old
        return False


def batch_norm(momentum: float = BN_MOMENTUM_TORCH,
               name: str = None) -> nn.BatchNorm:
    """torch ``nn.BatchNorm2d`` equivalent (fp32 stats/params)."""
    return nn.BatchNorm(
        momentum=torch_bn_momentum(momentum),
        epsilon=BN_EPS,
        dtype=_BN_COMPUTE_DTYPE,
        param_dtype=jnp.float32,
        name=name,
    )


class TorchConvTranspose(nn.Module):
    """torch ``nn.ConvTranspose2d`` with stride/padding semantics.

    The kernel parameter is stored (kh, kw, in_ch, out_ch); the forward
    pass is the mathematically equivalent dilated convolution:
    ``conv(dilate(x, s), flip(W), pad = k - 1 - p)``.

    Used only by the HRNet deconv head (reference
    ``pose_higher_hrnet.py:513-524``: k=4, s=2, p=1, no bias).
    """

    features: int
    ksize: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(0.001),
            (self.ksize, self.ksize, in_ch, self.features), jnp.float32)
        k = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        pad = self.ksize - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y.astype(self.dtype)
