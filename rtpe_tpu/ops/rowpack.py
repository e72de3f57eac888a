"""Row space-to-depth ("rowpack") execution transform for TPU.

TPU HBM layouts pad the minor (channel) dimension to 128 lanes, so a
48-channel activation physically occupies 128 channels — 2.67x wasted
bytes on HigherHRNet's high-resolution branch and deconv head, which is
exactly where the reference model spends its memory traffic
(``rtpe/third_party/pose_higher_hrnet.py:238-256,513-545``).  Packing
TWO image rows into channels (H, W, C) -> (H/2, W, 2C) brings those
tensors to 96 channels (128-lane physical: 1.33x) — **half the HBM
bytes** — while a transformed convolution computes the *identical*
function with only 2x the logical MXU FLOPs (the model is
bandwidth-bound, so the FLOPs are free).

This module holds the layout ops and the exact weight transforms; the
packed model graph lives in ``models/hrnet_packed.py``.

Packed channel order is subpixel-major: packed channel ``d*C + c`` holds
original channel ``c`` of row ``2*r + d``.  All transforms below are
mathematically exact (they only re-index weights; zero-padding at the
image border is preserved by construction).

Notation for the transforms, all on HWIO kernels:

* ``pp`` — packed in, packed out  (stride-1 3x3 branch convolutions)
* ``up`` — unpacked in, packed out (entering the packed domain)
* ``pu`` — packed in, unpacked out (stride-2 fuse downsampling)
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "s2d_rows", "d2s_rows", "fold_bn",
    "pack33_pp", "pack33_up", "pack33s2_pu", "pack11_pp",
    "pack_tconv4x4s2_pp", "upsample_into_packed",
    "conv_pp", "conv_up", "conv_pu", "tconv_pp",
]


def s2d_rows(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H//2, W, 2C), channel order ``d*C + c``."""
    n, h, w, c = x.shape
    assert h % 2 == 0, h
    x = x.reshape(n, h // 2, 2, w, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(n, h // 2, w, 2 * c)


def d2s_rows(x: jax.Array) -> jax.Array:
    """Inverse of :func:`s2d_rows`."""
    n, hp, w, c2 = x.shape
    assert c2 % 2 == 0, c2
    c = c2 // 2
    x = x.reshape(n, hp, w, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(n, hp * 2, w, c)


def fold_bn(kernel: jax.Array, scale, bias, mean, var,
            eps: float = 1e-5) -> Tuple[jax.Array, jax.Array]:
    """Fold inference BatchNorm into the preceding conv (HWIO kernel).

    ``y = (conv(x, W) - mean) * scale / sqrt(var + eps) + bias`` becomes
    ``conv(x, W * g) + (bias - mean * g)`` with ``g = scale/sqrt(var+eps)``.
    """
    g = scale / jnp.sqrt(var + eps)
    return kernel * g, bias - mean * g


def _hpack_slots(k: int, stride: int):
    """For output subpixel ``u`` and kernel H index ``kh`` of a stride-1
    original conv (pad (k-1)//2), the original input row offset is
    ``t = stride*u + kh - (k-1)//2`` which lands on packed row offset
    ``p = floor(t/2)`` subpixel ``d = t - 2p``.  Yields (u, kh, p, d)."""
    pad = (k - 1) // 2
    for u in range(2):
        for kh in range(k):
            t = stride * u + kh - pad
            p = t // 2  # floor division, exact for negatives
            d = t - 2 * p
            yield u, kh, p, d


def pack33_pp(w: jax.Array) -> jax.Array:
    """(3,3,C,K) stride-1 conv, packed in -> packed out: (3,3,2C,2K).

    Apply with stride 1, padding ((1,1),(1,1)) on packed rows.
    """
    kh_, kw_, cin, cout = w.shape
    assert kh_ == 3 and kw_ == 3
    out = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    for u, kh, p, d in _hpack_slots(3, 1):
        assert -1 <= p <= 1, p
        out = out.at[p + 1, :, d * cin:(d + 1) * cin,
                     u * cout:(u + 1) * cout].add(w[kh])
    return out


def pack33_up(w: jax.Array) -> jax.Array:
    """(3,3,C,K) stride-1 conv, unpacked in -> packed out: (4,3,C,2K).

    Apply with strides (2,1), padding ((1,1),(1,1)).
    """
    kh_, kw_, cin, cout = w.shape
    assert kh_ == 3 and kw_ == 3
    out = jnp.zeros((4, 3, cin, 2 * cout), w.dtype)
    for u in range(2):
        for kh in range(3):
            t = u + kh - 1  # original row offset from 2m, in [-1, 2]
            out = out.at[t + 1, :, :, u * cout:(u + 1) * cout].add(w[kh])
    return out


def pack33s2_pu(w: jax.Array) -> jax.Array:
    """(3,3,C,K) stride-2 conv (pad 1), packed in -> unpacked out:
    (2,3,2C,K).  Apply with strides (1,2), padding ((1,0),(1,1)).

    Original input row for output ``o`` is ``2o + kh - 1``; on packed
    rows that is ``p = o + floor((kh-1)/2)`` in {o-1, o}, ``d = (kh-1)%2``.
    """
    kh_, kw_, cin, cout = w.shape
    assert kh_ == 3 and kw_ == 3
    out = jnp.zeros((2, 3, 2 * cin, cout), w.dtype)
    for kh in range(3):
        t = kh - 1
        p = t // 2       # -1 or 0
        d = t - 2 * p
        out = out.at[p + 1, :, d * cin:(d + 1) * cin, :].add(w[kh])
    return out


def pack11_pp(w: jax.Array) -> jax.Array:
    """(1,1,C,K) conv, packed in -> packed out: (1,1,2C,2K) block-diag."""
    _, _, cin, cout = w.shape
    out = jnp.zeros((1, 1, 2 * cin, 2 * cout), w.dtype)
    for d in range(2):
        out = out.at[0, 0, d * cin:(d + 1) * cin,
                     d * cout:(d + 1) * cout].set(w[0, 0])
    return out


def tile_packed(v: jax.Array) -> jax.Array:
    """Per-channel vector (bias/BN param) -> packed (2C,) layout."""
    return jnp.tile(v, 2)


def pack_tconv4x4s2_pp(w: jax.Array, in_splits: Tuple[int, ...]
                       ) -> jax.Array:
    """Torch ConvTranspose2d k=4 s=2 p=1 kernel (4,4,Cin,K), packed in ->
    packed out: (4,4,2Cin,2K).

    ``in_splits`` describes the packed input channel layout when it is a
    concatenation of separately-packed tensors (e.g. ``(48, 34)`` for the
    deconv input ``cat(x, heatmaps)``): actual packed input channel index
    for original channel ``c`` of subpixel ``d`` is offset-mapped per
    split, while the canonical kernel indexes the *flat* concatenated
    ``Cin``.

    Output relation (torch tconv): ``o = 2i + kh - 1``.  With packed
    rows ``o = 2m+u``, ``i = 2p+d``: ``m = 2p + d + (kh-1-u)/2`` for
    ``kh ≡ (u+1) mod 2`` — an H-stride-2 transposed conv on packed rows
    with a 4-tap H kernel (offsets -1..2 => same k=4, p=1 envelope).
    Apply like ``TorchConvTranspose``: flip kernel, lhs_dilation (2,2),
    padding ((2,2),(2,2)).
    """
    kh_, kw_, cin, cout = w.shape
    assert kh_ == 4 and kw_ == 4
    assert sum(in_splits) == cin, (in_splits, cin)
    offs = np.cumsum((0,) + tuple(in_splits))
    out = jnp.zeros((4, 4, 2 * cin, 2 * cout), w.dtype)
    for u in range(2):
        for kh in range(4):
            if (kh % 2) != ((u + 1) % 2):
                continue
            for d in range(2):
                # H tap offset = m - 2p = d + (kh-1-u)//2, in [-1, 2]
                t = d + (kh - 1 - u) // 2
                assert -1 <= t <= 2, t
                for s, cs in enumerate(in_splits):
                    # packed input channels of split s, subpixel d
                    a0 = 2 * offs[s] + d * cs
                    out = out.at[t + 1, :, a0:a0 + cs,
                                 u * cout:(u + 1) * cout].add(
                        w[kh, :, offs[s]:offs[s] + cs, :])
    return out


def pack_fuse_up(w: jax.Array, factor: int, packed_out: bool = True
                 ) -> jax.Array:
    """Fuse-layer 1x1 conv + nearest ``factor``-upsample as ONE kernel.

    Nearest-repeat after a 1x1 conv is a transposed conv whose taps all
    equal the 1x1 weight; emitting the upsampled tensor straight from
    the MXU avoids the broadcast materialization pass entirely.  With
    ``packed_out`` the H-repeat is ``factor//2`` on packed rows plus a
    channel tile (both output subpixel blocks share the weight).

    Returns kernel (fh, fw, C, K') for :func:`apply_fuse_up`, where
    ``fh = factor//2 if packed_out else factor``, ``fw = factor`` and
    ``K' = 2K if packed_out else K``.
    """
    _, _, cin, cout = w.shape
    fh = factor // 2 if packed_out else factor
    fw = factor
    assert fh >= 1 and fw >= 1
    w11 = w[0, 0]
    if packed_out:
        w11 = jnp.concatenate([w11, w11], axis=-1)  # channel tile x2
    return jnp.broadcast_to(w11, (fh, fw) + w11.shape)


def apply_fuse_up(x, w, bias=None):
    """Apply a :func:`pack_fuse_up` kernel: lhs-dilated conv, pad
    (f-1, f-1) per axis, so output pixel ``f*j + s`` reads input ``j``
    (every window covers exactly one real dilated sample)."""
    fh, fw = w.shape[0], w.shape[1]
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((fh - 1, fh - 1), (fw - 1, fw - 1)),
        lhs_dilation=(fh, fw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y if bias is None else y + bias


def upsample_into_packed(y: jax.Array, factor: int) -> jax.Array:
    """Nearest-upsample unpacked ``y`` by an even ``factor`` directly
    into the packed-rows layout of the target: H repeat ``factor//2`` on
    packed rows + channel tile 2, W repeat ``factor``.  Equals
    ``s2d_rows(upsample_nearest(y, factor))`` exactly.
    """
    assert factor >= 2 and factor % 2 == 0, factor
    if factor > 2:
        y = jnp.repeat(y, factor // 2, axis=1)
    y = jnp.repeat(y, factor, axis=2)
    return jnp.tile(y, (1, 1, 1, 2))


# ---- application helpers (keep padding/stride conventions in one place).
# All accumulate and add the (folded-BN) bias in fp32; the caller casts
# after the activation — same numeric story as conv->fp32 BN->cast in the
# canonical model.

def conv_pp(x, w, bias=None, stride_w: int = 1):
    """Packed->packed stride-1 3x3 (or 1x1) conv."""
    kh, kw = w.shape[0], w.shape[1]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    y = jax.lax.conv_general_dilated(
        x, w, (1, stride_w), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y if bias is None else y + bias


def conv_up(x, w, bias=None):
    """Unpacked->packed: kernel (4,3), strides (2,1), pad ((1,1),(1,1))."""
    y = jax.lax.conv_general_dilated(
        x, w, (2, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y if bias is None else y + bias


def conv_pu(x, w, bias=None):
    """Packed->unpacked stride-2: kernel (2,3), strides (1,2),
    pad ((1,0),(1,1))."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 2), ((1, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y if bias is None else y + bias


def tconv_pp(x, w, bias=None):
    """Packed->packed transposed conv (from :func:`pack_tconv4x4s2_pp`)."""
    k = jnp.flip(w, axis=(0, 1))
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return y if bias is None else y + bias
