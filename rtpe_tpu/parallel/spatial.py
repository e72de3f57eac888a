"""Spatial activation sharding with halo exchange — the CNN analog of
context/sequence parallelism (SURVEY.md §5.7).

The reference has no distributed execution at all; its closest concept
is multi-resolution fusion inside one chip.  For inputs too large for a
single chip's HBM (>1k px), the H dimension of activations is sharded
across the mesh ``model`` axis; 3×3 convolutions then need one row of
halo from each neighbor, exchanged with ``lax.ppermute`` over ICI
inside ``shard_map``.  Zero padding at the outer edges reproduces
exactly the unsharded 'same' convolution.
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _exchange_halos(xl: jax.Array, halo: int, axis_name: str):
    """Return (top_halo, bottom_halo) rows coming from the neighbors;
    zeros at the outer boundaries."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    # my bottom rows go to my lower neighbor's top halo, and vice versa
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    top_from_above = lax.ppermute(xl[:, -halo:], axis_name, fwd)
    bot_from_below = lax.ppermute(xl[:, :halo], axis_name, bwd)
    top = jnp.where(idx == 0, jnp.zeros_like(top_from_above),
                    top_from_above)
    bot = jnp.where(idx == n - 1, jnp.zeros_like(bot_from_below),
                    bot_from_below)
    return top, bot


def halo_conv(x: jax.Array, kernel: jax.Array, mesh: Mesh,
              axis_name: str = "model", stride: int = 1) -> jax.Array:
    """'Same'-padded NHWC convolution with H sharded over ``axis_name``.

    :param x: (B, H, W, C) array sharded (or shardable) as
      P(None, axis_name) on ``mesh``.
    :param kernel: (kh, kw, C, C_out) HWIO weights (replicated).
    :returns: (B, H/stride, W/stride, C_out) with the same sharding.

    Requires H/n_shards divisible by stride and kernel height odd.
    """
    kh, kw = kernel.shape[:2]
    halo = kh // 2
    pad_w = kw // 2

    def local_conv(xl, k):
        if halo > 0:
            top, bot = _exchange_halos(xl, halo, axis_name)
            xl = jnp.concatenate([top, xl, bot], axis=1)
        y = lax.conv_general_dilated(
            xl, k,
            window_strides=(stride, stride),
            padding=((0, 0), (pad_w, pad_w)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y.astype(xl.dtype)

    fn = jax.shard_map(
        local_conv, mesh=mesh,
        in_specs=(P(None, axis_name), P()),
        out_specs=P(None, axis_name))
    return fn(x, kernel)


def shard_spatial(x: jax.Array, mesh: Mesh,
                  axis_name: str = "model") -> jax.Array:
    """Device-put (B, H, W, C) with H sharded over ``axis_name``."""
    return jax.device_put(
        x, NamedSharding(mesh, P(None, axis_name)))


def sharded_stem_apply(variables, x: jax.Array, mesh: Mesh,
                       axis_name: str = "model") -> jax.Array:
    """The W48 teacher stem (conv1-bn1-relu, conv2-bn2-relu; reference
    ``pose_higher_hrnet.py:362-370``) with activations H-sharded over
    the ``model`` axis — the inference entry for inputs so large (>1k
    px) that the stem activations exceed one chip's HBM.  Inference BN
    is per-channel affine, so only the 3x3 stride-2 convolutions need
    the halo exchange; output equals the unsharded stem exactly
    (``tests/test_spatial_stem.py``).

    :param variables: canonical ``PoseHigherHRNet`` variables.
    :param x: (B, H, W, 3), H divisible by 4 * mesh.shape[axis_name].
    :returns: (B, H/4, W/4, 64) stem features, H-sharded.
    """
    p, s = variables["params"], variables["batch_stats"]
    x = shard_spatial(x.astype(jnp.float32), mesh, axis_name)
    for conv_name, bn_name in (("conv1", "bn1"), ("conv2", "bn2")):
        x = halo_conv(x, p[conv_name]["kernel"].astype(x.dtype), mesh,
                      axis_name, stride=2)
        bn_p, bn_s = p[bn_name], s[bn_name]
        g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
        x = jax.nn.relu((x - bn_s["mean"]) * g + bn_p["bias"])
    return x
