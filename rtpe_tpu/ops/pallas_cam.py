"""Fused ContextAwareModule (CAM) forward/backward Pallas kernels.

Why: the distillation train step runs at ~100% of the logical HBM
roofline (2.253 GB/img at 336.8 img/s = 92.7% of v5e peak, r4 bench;
per-op profile: ~46% of step time is BN batch-stat passes, ~15%
BN-apply fusions, convolutions ~3%).  XLA materializes every conv/BN
boundary tensor of the CAM in HBM and re-reads it for the stats pass,
the normalize pass and the concat.  The only lever at the roofline is
moving fewer logical bytes, so these kernels recompute the CAM's
internals from ``x`` inside VMEM and touch HBM a fixed small number
of times:

    forward :  3 streams of x  +  the (B,H,W,C) output
    backward:  3 streams of x  +  1 of the cotangent  +  dx (x3)

The convolution FLOPs triple, but the MXU is ~3% busy in this step —
FLOPs are free; bytes are not.

Reference semantics (rtpe_tpu/models/students.py:103-141, itself from
the reference's students.py:145-201):

    res  = relu(BN_r(conv1x1_r(x)))
    gate = sigmoid(fc2(relu(fc1(gap(x)))))          # SELayer
    a_i  = relu(BN_i(conv3x3_dil_i(x)))             # i over dilations
    y    = relu(BN_t(conv1x1_t(concat_i a_i)))
    out  = relu(res + y * gate)                     # f32 add, cast back

All BNs use BATCH statistics in train mode, so gradients flow through
the means and variances.  To keep that exact under ``jax.grad``
without one monolithic hand-written VJP, the CAM is split into three
custom_vjp ops, with the tiny glue (stat finalization, rsqrt, the SE
MLP, running-stat updates) left to plain JAX:

    F1: x -> (sums/sumsqs of conv_r(x) and each conv_i(x)), gap(x)
    F2: x, branch stats + bn params -> sums/sumsqs of the top conv
    F3: x, all stats, SE gate, params -> out

``d out/d x`` then arrives as the sum of the three ops' dx cotangents
— exactly the batch-norm-through-batch-stats backward, assembled by
autodiff.

Numerics: conv outputs are rounded to bf16 before entering the
statistics and branch activations are rounded to bf16 before the top
conv, matching the unfused flax path (model dtype bf16); accumulation
and normalization arithmetic are f32 (the unfused path normalizes in
the BN compute dtype — bf16 in the production train config — so the
fused path is the more accurate of the two; parity tests use
tolerances).

Non-TPU backends run the same kernels under ``interpret=True`` (the
CPU parity tests); production entry is
``ContextAwareModule(fused=True)`` / ``AttentionStudentSteps(
fused_cam=True)``.
"""

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5
_BAND = 16  # rows per band; bf16 sublane tile


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _nb(h: int) -> int:
    return -(-h // _BAND)


def _wp(w: int) -> int:
    """Bands are processed at a column-padded width (multiple of the
    16-row bf16 sublane granule) so that (BAND, wp, C) -> (BAND*wp, C)
    reshapes are layout no-ops — Mosaic rejects the merge otherwise
    ("infer-vector-layout: unsupported shape cast" at w=113).  The
    extra columns hold zeros (from the zero-padded scratch) and are
    masked out of every reduction."""
    return -(-w // 16) * 16


def _row_mask(r0, h, w, wp):
    # (BAND*wp, 1): row inside the image AND column inside the width
    i = jax.lax.broadcasted_iota(jnp.int32, (_BAND * wp, 1), 0)
    ok = jnp.logical_and((i // wp) + r0 < h, (i % wp) < w)
    return ok.astype(jnp.float32)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _mmT(a, b):
    """a^T @ b over the leading (pixel) dim: (P,Ca),(P,Cb) -> (Ca,Cb)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fill_pad(ref, src, h, w, m):
    """Zero ``ref`` and write ``src`` (h, w, c) into its interior."""
    ref[:] = jnp.zeros(ref.shape, ref.dtype)
    ref[pl.ds(m, h), pl.ds(m, w), :] = src


def _band_of(ref, r0, w, m):
    """(BAND*wp, C) band at rows [r0, r0+BAND) of a padded ref (the
    wp - w junk columns read the scratch's zero padding)."""
    wp = _wp(w)
    sl = ref[pl.ds(r0 + m, _BAND), pl.ds(m, wp), :]
    return sl.reshape(_BAND * wp, sl.shape[-1])


def _band_conv(ref, r0, w, m, kref, i, dil, transpose=False, ch=None):
    """Dilated 3x3 conv (or its input-transpose) over one row band.

    ref: (Hp, wp + 2m, C) padded source; kref: (nb, 3, 3, C, K) kernel
    ref, branch ``i`` (taps loaded 2D straight off the ref).
    ``ch=(start, size)`` restricts the source's channel slice (used to
    pick one branch out of the packed dc scratch).  The transpose form
    computes sum_tap shift_{-tap}(src) @ tap^T.
    Returns (BAND*wp, K|C) f32.
    """
    acc = None
    wp = _wp(w)
    c_sl = slice(None) if ch is None else pl.ds(ch[0], ch[1])
    for ti in range(3):
        for tj in range(3):
            di, dj = (ti - 1) * dil, (tj - 1) * dil
            if transpose:
                di, dj = -di, -dj
            sl = ref[pl.ds(r0 + m + di, _BAND), pl.ds(m + dj, wp), c_sl]
            a2 = sl.reshape(_BAND * wp, sl.shape[-1])
            k = kref[i, ti, tj]
            p = _mm(a2, k.T if transpose else k)
            acc = p if acc is None else acc + p
    return acc


def _to_band(v2, w):
    """(BAND*wp, K) -> (BAND, w, K): split (a layout no-op) and drop
    the junk columns."""
    wp = _wp(w)
    return v2.reshape(_BAND, wp, v2.shape[-1])[:, :w, :]


def _bn_fwd(c_bf, row, ref):
    """relu(scale * (c - mean) * inv + bias); bn rows are
    [mean, inv, scale, bias] stacked along dim 0 of ``ref``."""
    mean = ref[row:row + 1, :]
    inv = ref[row + 1:row + 2, :]
    scale = ref[row + 2:row + 3, :]
    bias = ref[row + 3:row + 4, :]
    z = (c_bf.astype(jnp.float32) - mean) * inv * scale + bias
    return jnp.maximum(z, 0.0), z


# ======================================================= F1: branch sums

def _f1_kernel(x_ref, kr_ref, kh_ref, s_r_ref, s_h_ref, gap_ref, xp,
               *, h, w, m, dils):
    b, band = pl.program_id(0), pl.program_id(1)

    @pl.when(band == 0)
    def _():
        _fill_pad(xp, x_ref[0], h, w, m)

    @pl.when(jnp.logical_and(b == 0, band == 0))
    def _():
        s_r_ref[:] = jnp.zeros(s_r_ref.shape, s_r_ref.dtype)
        s_h_ref[:] = jnp.zeros(s_h_ref.shape, s_h_ref.dtype)
        gap_ref[:] = jnp.zeros(gap_ref.shape, gap_ref.dtype)

    r0 = band * _BAND
    mask = _row_mask(r0, h, w, _wp(w))
    xb = _band_of(xp, r0, w, m)

    rc = _mm(xb, kr_ref[:]).astype(jnp.bfloat16).astype(jnp.float32)
    s_r_ref[0:1, :] += jnp.sum(rc * mask, axis=0, keepdims=True)
    s_r_ref[1:2, :] += jnp.sum(rc * rc * mask, axis=0, keepdims=True)

    for i, d in enumerate(dils):
        c = _band_conv(xp, r0, w, m, kh_ref, i, d)
        c = c.astype(jnp.bfloat16).astype(jnp.float32)
        s_h_ref[2 * i:2 * i + 1, :] += jnp.sum(
            c * mask, axis=0, keepdims=True)
        s_h_ref[2 * i + 1:2 * i + 2, :] += jnp.sum(
            c * c * mask, axis=0, keepdims=True)

    gap_ref[pl.ds(b, 1), :] += jnp.sum(
        xb.astype(jnp.float32) * mask, axis=0, keepdims=True)


def _f1b_kernel(x_ref, kr_ref, kh_ref, dsr_ref, dsh_ref, dgap_ref,
                dx_ref, dkr_ref, dkh_ref, xp, dcp,
                *, h, w, m, dils, inv_n):
    b, phase, band = (pl.program_id(0), pl.program_id(1),
                      pl.program_id(2))
    r0 = band * _BAND
    mask = _row_mask(r0, h, w, _wp(w))

    @pl.when(jnp.logical_and(phase == 0, band == 0))
    def _():
        xp[:] = jnp.zeros(xp.shape, xp.dtype)
        xp[pl.ds(m, h), pl.ds(m, w), :] = x_ref[0]
        dcp[:] = jnp.zeros(dcp.shape, dcp.dtype)

    @pl.when(jnp.logical_and(
        b == 0, jnp.logical_and(phase == 0, band == 0)))
    def _():
        dkr_ref[:] = jnp.zeros(dkr_ref.shape, dkr_ref.dtype)
        dkh_ref[:] = jnp.zeros(dkh_ref.shape, dkh_ref.dtype)

    hc = dkh_ref.shape[-1]

    @pl.when(phase == 0)
    def _():
        # dc_i = dS1_i + 2 c_i dS2_i, stashed (masked) for the
        # transposed-conv pass; tap kernel grads accumulate here too.
        for i, d in enumerate(dils):
            c = _band_conv(xp, r0, w, m, kh_ref, i, d)
            c = c.astype(jnp.bfloat16).astype(jnp.float32)
            dc = (dsh_ref[2 * i:2 * i + 1, :]
                  + 2.0 * c * dsh_ref[2 * i + 1:2 * i + 2, :]) * mask
            dcb = _to_band(dc.astype(jnp.bfloat16), w)
            dcp[pl.ds(r0 + m, _BAND), pl.ds(m, w),
                pl.ds(i * hc, hc)] = dcb
            for ti in range(3):
                for tj in range(3):
                    di, dj = (ti - 1) * d, (tj - 1) * d
                    sl = xp[pl.ds(r0 + m + di, _BAND),
                            pl.ds(m + dj, _wp(w)), :]
                    xs = sl.reshape(_BAND * _wp(w), sl.shape[-1])
                    dkh_ref[i, ti, tj] += _mmT(
                        (xs.astype(jnp.float32) * mask
                         ).astype(jnp.bfloat16), dc.astype(jnp.bfloat16))

    @pl.when(phase == 1)
    def _():
        xb = _band_of(xp, r0, w, m)
        rc = _mm(xb, kr_ref[:]).astype(jnp.bfloat16).astype(jnp.float32)
        dr = (dsr_ref[0:1, :] + 2.0 * rc * dsr_ref[1:2, :]) * mask
        dkr_ref[:, :] += _mmT(
            (xb.astype(jnp.float32) * mask).astype(jnp.bfloat16),
            dr.astype(jnp.bfloat16))
        dx = _mm(dr.astype(jnp.bfloat16), kr_ref[:].T)
        for i, d in enumerate(dils):
            dx += _band_conv(dcp, r0, w, m, kh_ref, i, d,
                             transpose=True, ch=(i * hc, hc))
        dx += dgap_ref[pl.ds(b, 1), :] * inv_n
        dx_ref[0] = _to_band(dx, w).astype(dx_ref.dtype)


# =================================================== F2: top-conv sums

def _f2_kernel(x_ref, kh_ref, kt_ref, bnh_ref, s_t_ref, xp,
               *, h, w, m, dils):
    b, band = pl.program_id(0), pl.program_id(1)

    @pl.when(band == 0)
    def _():
        _fill_pad(xp, x_ref[0], h, w, m)

    @pl.when(jnp.logical_and(b == 0, band == 0))
    def _():
        s_t_ref[:] = jnp.zeros(s_t_ref.shape, s_t_ref.dtype)

    r0 = band * _BAND
    mask = _row_mask(r0, h, w, _wp(w))
    t = None
    for i, d in enumerate(dils):
        c = _band_conv(xp, r0, w, m, kh_ref, i, d)
        a, _ = _bn_fwd(c.astype(jnp.bfloat16), 4 * i, bnh_ref)
        p = _mm(a.astype(jnp.bfloat16), kt_ref[i])
        t = p if t is None else t + p
    t = t.astype(jnp.bfloat16).astype(jnp.float32)
    s_t_ref[0:1, :] += jnp.sum(t * mask, axis=0, keepdims=True)
    s_t_ref[1:2, :] += jnp.sum(t * t * mask, axis=0, keepdims=True)


def _f2b_kernel(x_ref, kh_ref, kt_ref, bnh_ref, dst_ref,
                dx_ref, dkh_ref, dkt_ref, dbnh_ref, xp, dcp,
                *, h, w, m, dils):
    b, phase, band = (pl.program_id(0), pl.program_id(1),
                      pl.program_id(2))
    r0 = band * _BAND
    mask = _row_mask(r0, h, w, _wp(w))
    hc = dkh_ref.shape[-1]

    @pl.when(jnp.logical_and(phase == 0, band == 0))
    def _():
        xp[:] = jnp.zeros(xp.shape, xp.dtype)
        xp[pl.ds(m, h), pl.ds(m, w), :] = x_ref[0]
        dcp[:] = jnp.zeros(dcp.shape, dcp.dtype)

    @pl.when(jnp.logical_and(
        b == 0, jnp.logical_and(phase == 0, band == 0)))
    def _():
        dkh_ref[:] = jnp.zeros(dkh_ref.shape, dkh_ref.dtype)
        dkt_ref[:] = jnp.zeros(dkt_ref.shape, dkt_ref.dtype)
        dbnh_ref[:] = jnp.zeros(dbnh_ref.shape, dbnh_ref.dtype)

    @pl.when(phase == 0)
    def _():
        # recompute t to get dt, then per-branch BN backward pieces
        cs, zs = [], []
        t = None
        for i, d in enumerate(dils):
            c = _band_conv(xp, r0, w, m, kh_ref, i, d
                           ).astype(jnp.bfloat16)
            a, z = _bn_fwd(c, 4 * i, bnh_ref)
            cs.append(c)
            zs.append(z)
            p = _mm(a.astype(jnp.bfloat16), kt_ref[i])
            t = p if t is None else t + p
        t = t.astype(jnp.bfloat16).astype(jnp.float32)
        dt = (dst_ref[0:1, :] + 2.0 * t * dst_ref[1:2, :]) * mask
        dt_bf = dt.astype(jnp.bfloat16)
        for i, d in enumerate(dils):
            a = jnp.maximum(zs[i], 0.0)
            dkt_ref[i] += _mmT(a.astype(jnp.bfloat16), dt_bf)
            da = _mm(dt_bf, kt_ref[i].T)
            dz = jnp.where(zs[i] > 0.0, da, 0.0) * mask
            cmm = (cs[i].astype(jnp.float32)
                   - bnh_ref[4 * i:4 * i + 1, :])
            dbnh_ref[2 * i:2 * i + 1, :] += jnp.sum(
                dz, axis=0, keepdims=True)
            dbnh_ref[2 * i + 1:2 * i + 2, :] += jnp.sum(
                dz * cmm, axis=0, keepdims=True)
            dc = dz * (bnh_ref[4 * i + 2:4 * i + 3, :]
                       * bnh_ref[4 * i + 1:4 * i + 2, :])
            dcb = _to_band(dc.astype(jnp.bfloat16), w)
            dcp[pl.ds(r0 + m, _BAND), pl.ds(m, w),
                pl.ds(i * hc, hc)] = dcb
            for ti in range(3):
                for tj in range(3):
                    di, dj = (ti - 1) * d, (tj - 1) * d
                    sl = xp[pl.ds(r0 + m + di, _BAND),
                            pl.ds(m + dj, _wp(w)), :]
                    xs = sl.reshape(_BAND * _wp(w), sl.shape[-1])
                    dkh_ref[i, ti, tj] += _mmT(
                        (xs.astype(jnp.float32) * mask
                         ).astype(jnp.bfloat16), dc.astype(jnp.bfloat16))

    @pl.when(phase == 1)
    def _():
        dx = None
        for i, d in enumerate(dils):
            p = _band_conv(dcp, r0, w, m, kh_ref, i, d,
                           transpose=True, ch=(i * hc, hc))
            dx = p if dx is None else dx + p
        dx_ref[0] = _to_band(dx, w).astype(dx_ref.dtype)


# ================================================= F3: the final output

def _f3_kernel(x_ref, kr_ref, kh_ref, kt_ref, bnr_ref, bnh_ref,
               bnt_ref, gate_ref, out_ref, xp, *, h, w, m, dils):
    b, band = pl.program_id(0), pl.program_id(1)

    @pl.when(band == 0)
    def _():
        _fill_pad(xp, x_ref[0], h, w, m)

    r0 = band * _BAND
    xb = _band_of(xp, r0, w, m)
    rc = _mm(xb, kr_ref[:]).astype(jnp.bfloat16)
    res, _ = _bn_fwd(rc, 0, bnr_ref)

    t = None
    for i, d in enumerate(dils):
        c = _band_conv(xp, r0, w, m, kh_ref, i, d).astype(jnp.bfloat16)
        a, _ = _bn_fwd(c, 4 * i, bnh_ref)
        p = _mm(a.astype(jnp.bfloat16), kt_ref[i])
        t = p if t is None else t + p
    y, _ = _bn_fwd(t.astype(jnp.bfloat16), 0, bnt_ref)

    out = jnp.maximum(res + y * gate_ref[pl.ds(b, 1), :], 0.0)
    out_ref[0] = _to_band(out, w).astype(out_ref.dtype)


def _f3b_kernel(x_ref, kr_ref, kh_ref, kt_ref, bnr_ref, bnh_ref,
                bnt_ref, gate_ref, g_ref,
                dx_ref, dkr_ref, dkh_ref, dkt_ref, dbnr_ref, dbnh_ref,
                dbnt_ref, dgate_ref, xp, dcp, gp, *, h, w, m, dils):
    b, phase, band = (pl.program_id(0), pl.program_id(1),
                      pl.program_id(2))
    r0 = band * _BAND
    mask = _row_mask(r0, h, w, _wp(w))
    hc = dkh_ref.shape[-1]

    @pl.when(jnp.logical_and(phase == 0, band == 0))
    def _():
        xp[:] = jnp.zeros(xp.shape, xp.dtype)
        xp[pl.ds(m, h), pl.ds(m, w), :] = x_ref[0]
        dcp[:] = jnp.zeros(dcp.shape, dcp.dtype)

    @pl.when(jnp.logical_and(
        b == 0, jnp.logical_and(phase == 0, band == 0)))
    def _():
        dgate_ref[:] = jnp.zeros(dgate_ref.shape, dgate_ref.dtype)
        dkr_ref[:] = jnp.zeros(dkr_ref.shape, dkr_ref.dtype)
        dkh_ref[:] = jnp.zeros(dkh_ref.shape, dkh_ref.dtype)
        dkt_ref[:] = jnp.zeros(dkt_ref.shape, dkt_ref.dtype)
        dbnr_ref[:] = jnp.zeros(dbnr_ref.shape, dbnr_ref.dtype)
        dbnh_ref[:] = jnp.zeros(dbnh_ref.shape, dbnh_ref.dtype)
        dbnt_ref[:] = jnp.zeros(dbnt_ref.shape, dbnt_ref.dtype)

    @pl.when(phase == 0)
    def _():
        xb = _band_of(xp, r0, w, m)
        rc = _mm(xb, kr_ref[:]).astype(jnp.bfloat16)
        res, zr = _bn_fwd(rc, 0, bnr_ref)

        cs, zs = [], []
        t = None
        for i, d in enumerate(dils):
            c = _band_conv(xp, r0, w, m, kh_ref, i, d
                           ).astype(jnp.bfloat16)
            a, z = _bn_fwd(c, 4 * i, bnh_ref)
            cs.append(c)
            zs.append(z)
            p = _mm(a.astype(jnp.bfloat16), kt_ref[i])
            t = p if t is None else t + p
        t_bf = t.astype(jnp.bfloat16)
        y, zt = _bn_fwd(t_bf, 0, bnt_ref)

        gate = gate_ref[pl.ds(b, 1), :]
        pre = res + y * gate
        gp[:, pl.ds(0, w), :] = g_ref[0]
        gg = gp[:].reshape(gp.shape[0] * gp.shape[1], gp.shape[2]
                           ).astype(jnp.float32)
        gg = jnp.where(mask > 0.0, gg, 0.0)  # junk cols/ragged rows
        do = jnp.where(pre > 0.0, gg, 0.0)

        dgate_ref[pl.ds(b, 1), :] += jnp.sum(do * y, axis=0,
                                             keepdims=True)

        # residual BN backward
        dzr = jnp.where(zr > 0.0, do, 0.0)
        rmm = rc.astype(jnp.float32) - bnr_ref[0:1, :]
        dbnr_ref[0:1, :] += jnp.sum(dzr, axis=0, keepdims=True)
        dbnr_ref[1:2, :] += jnp.sum(dzr * rmm, axis=0, keepdims=True)
        drc = dzr * (bnr_ref[2:3, :] * bnr_ref[1:2, :])
        dkr_ref[:, :] += _mmT(
            (xb.astype(jnp.float32) * mask).astype(jnp.bfloat16),
            drc.astype(jnp.bfloat16))
        # residual path dx is local (1x1): stash it in dcp's tail? no —
        # recompute in phase 1 (cheap: one matmul).

        # top BN backward
        dy = do * gate
        dzt = jnp.where(zt > 0.0, dy, 0.0)
        tmm = t_bf.astype(jnp.float32) - bnt_ref[0:1, :]
        dbnt_ref[0:1, :] += jnp.sum(dzt, axis=0, keepdims=True)
        dbnt_ref[1:2, :] += jnp.sum(dzt * tmm, axis=0, keepdims=True)
        dt = dzt * (bnt_ref[2:3, :] * bnt_ref[1:2, :])
        dt_bf = dt.astype(jnp.bfloat16)

        for i, d in enumerate(dils):
            a = jnp.maximum(zs[i], 0.0)
            dkt_ref[i] += _mmT(a.astype(jnp.bfloat16), dt_bf)
            da = _mm(dt_bf, kt_ref[i].T)
            dz = jnp.where(zs[i] > 0.0, da, 0.0) * mask
            cmm = (cs[i].astype(jnp.float32)
                   - bnh_ref[4 * i:4 * i + 1, :])
            dbnh_ref[2 * i:2 * i + 1, :] += jnp.sum(
                dz, axis=0, keepdims=True)
            dbnh_ref[2 * i + 1:2 * i + 2, :] += jnp.sum(
                dz * cmm, axis=0, keepdims=True)
            dc = dz * (bnh_ref[4 * i + 2:4 * i + 3, :]
                       * bnh_ref[4 * i + 1:4 * i + 2, :])
            dcb = _to_band(dc.astype(jnp.bfloat16), w)
            dcp[pl.ds(r0 + m, _BAND), pl.ds(m, w),
                pl.ds(i * hc, hc)] = dcb
            for ti in range(3):
                for tj in range(3):
                    di, dj = (ti - 1) * d, (tj - 1) * d
                    sl = xp[pl.ds(r0 + m + di, _BAND),
                            pl.ds(m + dj, _wp(w)), :]
                    xs = sl.reshape(_BAND * _wp(w), sl.shape[-1])
                    dkh_ref[i, ti, tj] += _mmT(
                        (xs.astype(jnp.float32) * mask
                         ).astype(jnp.bfloat16), dc.astype(jnp.bfloat16))

    @pl.when(phase == 1)
    def _():
        # recompute the (local) residual-path cotangent, add the
        # halo-dependent transposed dilated convs from dcp
        xb = _band_of(xp, r0, w, m)
        rc = _mm(xb, kr_ref[:]).astype(jnp.bfloat16)
        res, zr = _bn_fwd(rc, 0, bnr_ref)
        t = None
        for i, d in enumerate(dils):
            c = _band_conv(xp, r0, w, m, kh_ref, i, d
                           ).astype(jnp.bfloat16)
            a, _ = _bn_fwd(c, 4 * i, bnh_ref)
            p = _mm(a.astype(jnp.bfloat16), kt_ref[i])
            t = p if t is None else t + p
        y, _ = _bn_fwd(t.astype(jnp.bfloat16), 0, bnt_ref)
        gate = gate_ref[0:1, :]
        pre = res + y * gate
        gp[:, pl.ds(0, w), :] = g_ref[0]
        gg = gp[:].reshape(gp.shape[0] * gp.shape[1], gp.shape[2]
                           ).astype(jnp.float32)
        gg = jnp.where(mask > 0.0, gg, 0.0)
        do = jnp.where(pre > 0.0, gg, 0.0)
        dzr = jnp.where(zr > 0.0, do, 0.0)
        drc = dzr * (bnr_ref[2:3, :] * bnr_ref[1:2, :])
        dx = _mm(drc.astype(jnp.bfloat16), kr_ref[:].T)
        for i, d in enumerate(dils):
            dx += _band_conv(dcp, r0, w, m, kh_ref, i, d,
                             transpose=True, ch=(i * hc, hc))
        dx_ref[0] = _to_band(dx, w).astype(dx_ref.dtype)


# =================================================== pallas_call wrappers

def _whole(shape):
    n = len(shape)
    return pl.BlockSpec(shape, lambda *_: (0,) * n)


def _per_image(shape):
    n = len(shape) - 1
    return pl.BlockSpec((1,) + shape[1:],
                        lambda b, *_: (b,) + (0,) * n)


def _band_out(shape):
    # (B, H, W, C) written band-by-band; ragged last band is masked
    return pl.BlockSpec((1, _BAND, shape[2], shape[3]),
                        lambda b, *rest: (b, rest[-1], 0, 0))


def _band_out_bwd(shape):
    """dx blocks for the two-phase backward grids (b, phase, band).

    Phase 0 never writes dx, but pallas flushes an output block
    whenever its index changes — mapping every phase-0 step to block 0
    confines the stale flushes to one block, which phase 1's band-0
    write then overwrites."""
    return pl.BlockSpec((1, _BAND, shape[2], shape[3]),
                        lambda b, p, nn: (b, p * nn, 0, 0))


def _xpad_scratch(h, w, c, m):
    return pltpu.VMEM((_nb(h) * _BAND + 2 * m, _wp(w) + 2 * m, c),
                      jnp.bfloat16)


def _f1_call(x, kr, kh, dils):
    b, h, w, c = x.shape
    nbr, _, _, _, hc = kh.shape
    m = max(dils)
    kern = functools.partial(_f1_kernel, h=h, w=w, m=m,
                             dils=tuple(dils))
    return pl.pallas_call(
        kern, grid=(b, _nb(h)),
        in_specs=[_per_image(x.shape), _whole(kr.shape),
                  _whole(kh.shape)],
        out_specs=[_whole((2, c)), _whole((2 * nbr, hc)),
                   _whole((b, c))],
        out_shape=[jax.ShapeDtypeStruct((2, c), jnp.float32),
                   jax.ShapeDtypeStruct((2 * nbr, hc), jnp.float32),
                   jax.ShapeDtypeStruct((b, c), jnp.float32)],
        scratch_shapes=[_xpad_scratch(h, w, c, m)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, kr, kh)


def _f1b_call(x, kr, kh, dsr, dsh, dgap, dils):
    b, h, w, c = x.shape
    nbr, _, _, _, hc = kh.shape
    m = max(dils)
    kern = functools.partial(_f1b_kernel, h=h, w=w, m=m,
                             dils=tuple(dils),
                             inv_n=1.0 / (h * w))
    dx, dkr, dkh = pl.pallas_call(
        kern, grid=(b, 2, _nb(h)),
        in_specs=[_per_image(x.shape), _whole(kr.shape),
                  _whole(kh.shape), _whole(dsr.shape),
                  _whole(dsh.shape), _whole((b, c))],
        out_specs=[_band_out_bwd(x.shape), _whole(kr.shape),
                   _whole(kh.shape)],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(kr.shape, jnp.float32),
                   jax.ShapeDtypeStruct(kh.shape, jnp.float32)],
        scratch_shapes=[
            _xpad_scratch(h, w, c, m),
            pltpu.VMEM((_nb(h) * _BAND + 2 * m, _wp(w) + 2 * m,
                        nbr * hc), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, kr, kh, dsr, dsh, dgap)
    return dx, dkr, dkh


def _f2_call(x, kh, kt, bnh, dils):
    b, h, w, c = x.shape
    m = max(dils)
    kern = functools.partial(_f2_kernel, h=h, w=w, m=m,
                             dils=tuple(dils))
    return pl.pallas_call(
        kern, grid=(b, _nb(h)),
        in_specs=[_per_image(x.shape), _whole(kh.shape),
                  _whole(kt.shape), _whole(bnh.shape)],
        out_specs=[_whole((2, c))],
        out_shape=[jax.ShapeDtypeStruct((2, c), jnp.float32)],
        scratch_shapes=[_xpad_scratch(h, w, c, m)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, kh, kt, bnh)[0]


def _f2b_call(x, kh, kt, bnh, dst, dils):
    b, h, w, c = x.shape
    nbr, _, _, _, hc = kh.shape
    m = max(dils)
    kern = functools.partial(_f2b_kernel, h=h, w=w, m=m,
                             dils=tuple(dils))
    return pl.pallas_call(
        kern, grid=(b, 2, _nb(h)),
        in_specs=[_per_image(x.shape), _whole(kh.shape),
                  _whole(kt.shape), _whole(bnh.shape),
                  _whole(dst.shape)],
        out_specs=[_band_out_bwd(x.shape), _whole(kh.shape),
                   _whole(kt.shape), _whole((2 * nbr, hc))],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(kh.shape, jnp.float32),
                   jax.ShapeDtypeStruct(kt.shape, jnp.float32),
                   jax.ShapeDtypeStruct((2 * nbr, hc), jnp.float32)],
        scratch_shapes=[
            _xpad_scratch(h, w, c, m),
            pltpu.VMEM((_nb(h) * _BAND + 2 * m, _wp(w) + 2 * m,
                        nbr * hc), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, kh, kt, bnh, dst)


def _f3_call(x, kr, kh, kt, bnr, bnh, bnt, gate, dils):
    b, h, w, c = x.shape
    m = max(dils)
    kern = functools.partial(_f3_kernel, h=h, w=w, m=m,
                             dils=tuple(dils))
    return pl.pallas_call(
        kern, grid=(b, _nb(h)),
        in_specs=[_per_image(x.shape), _whole(kr.shape),
                  _whole(kh.shape), _whole(kt.shape),
                  _whole(bnr.shape), _whole(bnh.shape),
                  _whole(bnt.shape), _whole(gate.shape)],
        out_specs=[_band_out(x.shape)],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype)],
        scratch_shapes=[_xpad_scratch(h, w, c, m)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, kr, kh, kt, bnr, bnh, bnt, gate)[0]


def _f3b_call(x, kr, kh, kt, bnr, bnh, bnt, gate, g, dils):
    b, h, w, c = x.shape
    nbr, _, _, _, hc = kh.shape
    m = max(dils)
    kern = functools.partial(_f3b_kernel, h=h, w=w, m=m,
                             dils=tuple(dils))
    return pl.pallas_call(
        kern, grid=(b, 2, _nb(h)),
        in_specs=[_per_image(x.shape), _whole(kr.shape),
                  _whole(kh.shape), _whole(kt.shape),
                  _whole(bnr.shape), _whole(bnh.shape),
                  _whole(bnt.shape), _whole(gate.shape),
                  # g is re-read per band in BOTH phases (the phase-1
                  # residual-path recompute needs the true band rows)
                  pl.BlockSpec((1, _BAND, w, c),
                               lambda bb, pp, nn_: (bb, nn_, 0, 0))],
        out_specs=[_band_out_bwd(x.shape), _whole(kr.shape),
                   _whole(kh.shape), _whole(kt.shape),
                   _whole((2, c)), _whole((2 * nbr, hc)),
                   _whole((2, c)), _whole(gate.shape)],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(kr.shape, jnp.float32),
                   jax.ShapeDtypeStruct(kh.shape, jnp.float32),
                   jax.ShapeDtypeStruct(kt.shape, jnp.float32),
                   jax.ShapeDtypeStruct((2, c), jnp.float32),
                   jax.ShapeDtypeStruct((2 * nbr, hc), jnp.float32),
                   jax.ShapeDtypeStruct((2, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, c), jnp.float32)],
        scratch_shapes=[
            _xpad_scratch(h, w, c, m),
            pltpu.VMEM((_nb(h) * _BAND + 2 * m, _wp(w) + 2 * m,
                        nbr * hc), jnp.bfloat16),
            pltpu.VMEM((_BAND, _wp(w), c), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x, kr, kh, kt, bnr, bnh, bnt, gate, g)


# ======================================================== custom_vjp ops

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def cam_f1(dils, x, kr, kh):
    """(sums/sumsqs of conv_r(x)) (2,C), per-branch (2*nb,hc), gap (B,C)."""
    s_r, s_h, gap = _f1_call(x, kr, kh, dils)
    return s_r, s_h, gap / (x.shape[1] * x.shape[2])


def _cam_f1_fwd(dils, x, kr, kh):
    out = cam_f1(dils, x, kr, kh)
    return out, (x, kr, kh)


def _cam_f1_bwd(dils, res, cts):
    x, kr, kh = res
    dsr, dsh, dgapm = cts
    # the kernel multiplies by 1/(H*W) itself (inv_n): pass the mean's
    # cotangent through unchanged
    dx, dkr, dkh = _f1b_call(x, kr, kh, dsr, dsh, dgapm, dils)
    return dx, dkr.astype(kr.dtype), dkh.astype(kh.dtype)


cam_f1.defvjp(_cam_f1_fwd, _cam_f1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def cam_f2(dils, x, kh, kt, bnh):
    """sums/sumsqs (2, C) of the top conv over normalized branches.

    ``bnh``: (4*nb, hc) f32 rows [mean, inv, scale, bias] per branch."""
    return _f2_call(x, kh, kt, bnh, dils)


def _cam_f2_fwd(dils, x, kh, kt, bnh):
    return cam_f2(dils, x, kh, kt, bnh), (x, kh, kt, bnh)


def _cam_f2_bwd(dils, res, dst):
    x, kh, kt, bnh = res
    dx, dkh, dkt, dS = _f2b_call(x, kh, kt, bnh, dst, dils)
    dbnh = _bn_param_grads(dS, bnh)
    return (dx, dkh.astype(kh.dtype), dkt.astype(kt.dtype), dbnh)


cam_f2.defvjp(_cam_f2_fwd, _cam_f2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def cam_f3(dils, x, kr, kh, kt, bnr, bnh, bnt, gate):
    """The CAM output (B, H, W, C) given all stats and the SE gate."""
    return _f3_call(x, kr, kh, kt, bnr, bnh, bnt, gate, dils)


def _cam_f3_fwd(dils, x, kr, kh, kt, bnr, bnh, bnt, gate):
    out = cam_f3(dils, x, kr, kh, kt, bnr, bnh, bnt, gate)
    return out, (x, kr, kh, kt, bnr, bnh, bnt, gate)


def _cam_f3_bwd(dils, res, g):
    x, kr, kh, kt, bnr, bnh, bnt, gate = res
    (dx, dkr, dkh, dkt, dSr, dSh, dSt, dgate) = _f3b_call(
        x, kr, kh, kt, bnr, bnh, bnt, gate, g, dils)
    return (dx, dkr.astype(kr.dtype), dkh.astype(kh.dtype),
            dkt.astype(kt.dtype), _bn_param_grads(dSr, bnr),
            _bn_param_grads(dSh, bnh), _bn_param_grads(dSt, bnt),
            dgate)


cam_f3.defvjp(_cam_f3_fwd, _cam_f3_bwd)


def _bn_param_grads(dS, bn):
    """(4k, hc) cotangent of the bn row-stack from the kernels'
    per-branch reductions ``dS`` = (2k, hc) rows [S1z, S2z]:

        z = (c - mean) * inv * scale + bias
        d mean  = -scale * inv * S1z        d scale = inv * S2z
        d inv   =  scale * S2z              d bias  = S1z
    """
    k = bn.shape[0] // 4
    rows = []
    for i in range(k):
        s1, s2 = dS[2 * i], dS[2 * i + 1]
        mean, inv, scale, bias = (bn[4 * i], bn[4 * i + 1],
                                  bn[4 * i + 2], bn[4 * i + 3])
        rows += [-scale * inv * s1, scale * s2, inv * s2, s1]
    return jnp.stack(rows)


# ===================================================== the fused module

def fused_cam(x, kr, kh, kt, scales, biases, gate_fn,
              dils: Sequence[int]):
    """Full fused CAM forward for one train-mode application.

    :param x: (B, H, W, C) bf16 input.
    :param kr: (C, C) residual 1x1 kernel (bf16).
    :param kh: (nb, 3, 3, C, hc) branch kernels (bf16).
    :param kt: (nb, hc, C) top 1x1 kernel split by branch (bf16).
    :param scales, biases: dicts with keys 'r', 't' -> (C,) and
        'h' -> (nb, hc), all f32.
    :param gate_fn: gap (B, C) -> gate (B, C) (the SE MLP, autodiffed
        by the caller's flax trace).
    :param dils: static dilations tuple.
    :returns: (out, stats) where stats maps 'r'/'t' -> (mean, var) and
        'h' -> ((nb, hc) means, (nb, hc) vars) for running-stat updates.
    """
    dils = tuple(dils)
    b, h, w, c = x.shape
    nbr, _, _, _, hc = kh.shape
    n = b * h * w

    s_r, s_h, gap = cam_f1(dils, x, kr, kh)
    mean_r = s_r[0] / n
    var_r = s_r[1] / n - jnp.square(mean_r)
    inv_r = jax.lax.rsqrt(var_r + BN_EPS)

    s1h = s_h[0::2] / n                    # (nb, hc)
    s2h = s_h[1::2] / n
    mean_h = s1h
    var_h = s2h - jnp.square(s1h)
    inv_h = jax.lax.rsqrt(var_h + BN_EPS)

    gate = gate_fn(gap)

    bnh = jnp.concatenate([
        jnp.stack([mean_h[i], inv_h[i], scales["h"][i], biases["h"][i]])
        for i in range(nbr)])               # (4*nb, hc)

    s_t = cam_f2(dils, x, kh, kt, bnh)
    mean_t = s_t[0] / n
    var_t = s_t[1] / n - jnp.square(mean_t)
    inv_t = jax.lax.rsqrt(var_t + BN_EPS)

    bnr = jnp.stack([mean_r, inv_r, scales["r"], biases["r"]])
    bnt = jnp.stack([mean_t, inv_t, scales["t"], biases["t"]])

    out = cam_f3(dils, x, kr, kh, kt, bnr, bnh, bnt, gate)
    stats = {"r": (mean_r, var_r), "t": (mean_t, var_t),
             "h": (mean_h, var_h)}
    return out, stats
