"""Fused BasicBlock-chain Pallas kernel == the unfused op chain.

The kernel (``ops/pallas_blocks.py``) is an optional serving path
(``packed_forward(pallas_chains=True)``); interpret mode checks its
semantics on the CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtpe_tpu.ops.pallas_blocks import basicblock_chain


def _dense_chain(x, w, b):
    for i in range(w.shape[0]):
        y = jax.lax.conv_general_dilated(
            x, w[i, 0], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b[i, 0], 0.0).astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            y, w[i, 1], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = (y + b[i, 1]).astype(x.dtype)
        x = jnp.maximum(y + x, 0.0)
    return x


@pytest.mark.parametrize("shape,n", [((2, 16, 16, 96), 2),
                                     ((1, 8, 24, 128), 4),
                                     ((2, 12, 8, 192), 1)])
def test_basicblock_chain_matches_dense(shape, n):
    rng = np.random.RandomState(0)
    c = shape[-1]
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(n, 2, 3, 3, c, c).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(n, 2, c).astype(np.float32) * 0.1)
    want = _dense_chain(x, w, b)
    got = basicblock_chain(x, w, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
