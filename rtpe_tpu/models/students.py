"""The student model family, TPU-native Flax builds.

Behavioral re-implementations of ``rtpe/students.py``:

* ``SkipConv`` / straight skip conv (:37-112)
* ``SELayer`` (:118-142) — returns the gate, not the gated input
* ``ContextAwareModule`` (:145-201)
* ``RefinerStudent`` (:302-386)
* ``MultistageStudent`` (:389-498)
* ``CamStudent`` (:502-592)
* ``AttentionStudent`` (:595-781)
* ``AttentionStudentSteps`` (:786-1073) — the flagship used by
  ``distillation.py:137-147``

Reference quirks that affect numerics are preserved intentionally and
flagged with ``# quirk:`` comments (e.g. the attention pyramid overwrites
its mid branch with the upsampled low branch, and the detection pyramid
of ``AttentionStudent`` calls ``det_hi`` twice).

The frozen stem is expressed with ``stop_gradient`` instead of torch's
``no_grad`` re-entry; under jit the forward computation is identical.
"""

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pooling import avg_pool, global_avg_pool
from ..ops.resize import resize_bilinear, resize_nearest
from .layers import batch_norm, conv
from .stem import STEM_OUT_CHANS, StemHRNet

Dtype = Any


# #############################################################################
# # BUILDING BLOCKS
# #############################################################################
class SkipConv(nn.Module):
    """N conv-bn-relu chain plus a projected residual (reference :37-90)."""

    out_chans: Sequence[int]
    ksizes: Sequence[int]
    strides: Sequence[int]
    dilations: Sequence[int]
    paddings: Sequence[int]
    downsample_chans: int  # 1x1 conv + BN projection of the input
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = conv(self.downsample_chans, 1, 1, 0, dtype=self.dtype,
                        name="downsample_conv")(x)
        residual = batch_norm(name="downsample_bn")(
            residual, use_running_average=not train)
        for i, (ch, k, s, d, p) in enumerate(zip(
                self.out_chans, self.ksizes, self.strides, self.dilations,
                self.paddings)):
            x = conv(ch, k, s, p, dilation=d, bias=False, dtype=self.dtype,
                     name=f"conv{i}")(x)
            x = batch_norm(name=f"bn{i}")(x, use_running_average=not train)
            x = nn.relu(x.astype(self.dtype))
        x = x.astype(jnp.float32) + residual.astype(jnp.float32)
        return nn.relu(x).astype(self.dtype)


def straight_skip_conv(num_layers: int, chans: int, out_last: int,
                       dtype, name: str) -> SkipConv:
    """Reference ``get_straight_skip_conv`` (:93-112): all-3x3 chain."""
    out_chans = [chans] * (num_layers - 1) + [out_last]
    return SkipConv(out_chans=tuple(out_chans),
                    ksizes=(3,) * num_layers,
                    strides=(1,) * num_layers,
                    dilations=(1,) * num_layers,
                    paddings=(1,) * num_layers,
                    downsample_chans=out_last,
                    dtype=dtype, name=name)


class SELayer(nn.Module):
    """Squeeze-excitation gate (reference :118-142).  Returns the
    (B, 1, 1, C) gate; the caller multiplies."""

    chans: int
    hidden_chans: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pooled: bool = False) -> jax.Array:
        hidden = self.hidden_chans or self.chans // 4
        # ``pooled``: x is already the (B, C) global average (the fused
        # CAM kernel computes it in its first pass)
        y = x if pooled else global_avg_pool(x)  # (B, C)
        y = nn.Dense(hidden, use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.chans, use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(y)
        y = nn.sigmoid(y.astype(jnp.float32)).astype(self.dtype)
        return y[:, None, None, :]


class _ConvKernel(nn.Module):
    """Declares (or at apply time reads) a conv kernel parameter with
    ``nn.Conv``'s exact name, shape and initializer — used by the fused
    CAM path to access weights without running the conv module."""

    shape: tuple

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _BNVars(nn.Module):
    """Declares ``nn.BatchNorm``'s params/batch_stats under the same
    names, for the fused CAM path (which computes the normalization
    itself).  Returns (scale, bias, mean_var, var_var); the caller
    updates the running stats."""

    feats: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.feats,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.feats,), jnp.float32)
        mean = self.variable("batch_stats", "mean", jnp.zeros,
                             (self.feats,), jnp.float32)
        var = self.variable("batch_stats", "var", jnp.ones,
                            (self.feats,), jnp.float32)
        return scale, bias, mean, var


class ContextAwareModule(nn.Module):
    """PCR context-aware module (reference :145-201).

    out = relu( residual(x) + SE_gate(x) * HDC(x) ), channel-preserving.

    ``fused=True`` routes train-mode batch applications through the
    Pallas fused-CAM kernels (``ops/pallas_cam.py``): identical
    parameter tree, same math with f32 stat/normalization arithmetic,
    ~4x less HBM traffic on the roofline-bound distillation step.
    Eval mode and initialization always use the unfused path.
    """

    chans: int
    hdc_dilations: Sequence[int] = (1, 2, 3, 4)
    se_chans: Optional[int] = None
    hdc_chans: Optional[int] = None
    dtype: Dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hdc_ch = self.hdc_chans or self.chans // 4
        if self.fused and train and not self.is_initializing():
            return self._fused_call(x, hdc_ch)
        # residual branch: 1x1 conv-bn-relu
        residual = conv(self.chans, 1, 1, 0, dtype=self.dtype,
                        name="residual_conv")(x)
        residual = batch_norm(name="residual_bn")(
            residual, use_running_average=not train)
        residual = nn.relu(residual.astype(self.dtype))
        # squeeze-excitation gate
        gate = SELayer(self.chans, self.se_chans, dtype=self.dtype,
                       name="se")(x)
        # hybrid dilated conv branch
        outs = []
        for i, d in enumerate(self.hdc_dilations):
            y = conv(hdc_ch, 3, 1, d, dilation=d, dtype=self.dtype,
                     name=f"hdc{i}_conv")(x)
            y = batch_norm(name=f"hdc{i}_bn")(y, use_running_average=not train)
            outs.append(nn.relu(y.astype(self.dtype)))
        y = jnp.concatenate(outs, axis=-1)
        y = conv(self.chans, 1, 1, 0, dtype=self.dtype, name="hdc_top_conv")(y)
        y = batch_norm(name="hdc_top_bn")(y, use_running_average=not train)
        y = nn.relu(y.astype(self.dtype))
        # dilation=padding keeps spatial dims, so no resize needed
        out = (residual.astype(jnp.float32)
               + (y * gate).astype(jnp.float32))
        return nn.relu(out).astype(self.dtype)

    def _fused_call(self, x: jax.Array, hdc_ch: int) -> jax.Array:
        """Train-mode application through the fused Pallas kernels.

        Reads the SAME parameters the unfused path creates (conv
        kernels, BN scale/bias, BN running stats, the SE MLP) and
        performs the running-stat updates flax's BatchNorm would."""
        from ..models.layers import torch_bn_momentum
        from ..ops.pallas_cam import fused_cam

        dils = tuple(self.hdc_dilations)
        c = self.chans
        kr = _ConvKernel((1, 1, c, c), name="residual_conv")()
        khs = [_ConvKernel((3, 3, c, hdc_ch), name=f"hdc{i}_conv")()
               for i in range(len(dils))]
        kt = _ConvKernel((1, 1, len(dils) * hdc_ch, c),
                         name="hdc_top_conv")()
        s_r, b_r, m_r, v_r = _BNVars(c, name="residual_bn")()
        bnh = [_BNVars(hdc_ch, name=f"hdc{i}_bn")()
               for i in range(len(dils))]
        s_t, b_t, m_t, v_t = _BNVars(c, name="hdc_top_bn")()
        se = SELayer(self.chans, self.se_chans, dtype=self.dtype,
                     name="se")

        def gate_fn(gap):
            g = se(gap.astype(self.dtype), pooled=True)  # (B,1,1,C)
            return g[:, 0, 0, :].astype(jnp.float32)

        bf = jnp.bfloat16
        out, stats = fused_cam(
            x.astype(bf),
            kr[0, 0].astype(bf),
            jnp.stack([k.astype(bf) for k in khs]),
            kt[0, 0].reshape(len(dils), hdc_ch, c).astype(bf),
            scales={"r": s_r, "t": s_t,
                    "h": jnp.stack([v[0] for v in bnh])},
            biases={"r": b_r, "t": b_t,
                    "h": jnp.stack([v[1] for v in bnh])},
            gate_fn=gate_fn, dils=dils)

        # flax BatchNorm's running-stat update (biased batch var)
        mom = torch_bn_momentum()
        m_r.value = mom * m_r.value + (1 - mom) * stats["r"][0]
        v_r.value = mom * v_r.value + (1 - mom) * stats["r"][1]
        m_t.value = mom * m_t.value + (1 - mom) * stats["t"][0]
        v_t.value = mom * v_t.value + (1 - mom) * stats["t"][1]
        for i, (_, _, mv, vv) in enumerate(bnh):
            mv.value = mom * mv.value + (1 - mom) * stats["h"][0][i]
            vv.value = mom * vv.value + (1 - mom) * stats["h"][1][i]
        return out.astype(self.dtype)


def _frozen(x: jax.Array, trainable: bool) -> jax.Array:
    return x if trainable else jax.lax.stop_gradient(x)


def _cam_cls(remat: bool):
    """``ContextAwareModule``, optionally remat-wrapped.

    With ``remat`` the backward pass recomputes each CAM block's
    internals (residual/HDC/SE chains) instead of loading them from HBM
    — only the block INPUT is saved.  MEASURED DEAD END on the real
    chip for the HBM-bound distillation step (r4 ablation: 266 vs 337
    img/s, bytes/img 2.25 -> 2.66): the recompute re-reads each
    block's big input tensors while XLA's scheduling already keeps the
    cheap internals out of HBM, so the trade adds traffic instead of
    removing it.  Kept as an opt-in for memory-constrained configs
    (bigger batches / resolutions, where saved-activation footprint,
    not bandwidth, is the binding resource).  Parameter trees are
    identical either way (flax lifted transforms preserve scope paths);
    gradients agree to numerical tolerance
    (``tests/test_train.py::test_remat_step_matches_baseline``).
    ``static_argnums=(2,)`` marks the python-bool ``train`` flag
    (arg 0 is the module instance).
    """
    if not remat:
        return ContextAwareModule
    return nn.remat(ContextAwareModule, static_argnums=(2,))


# #############################################################################
# # STUDENTS
# #############################################################################
class RefinerStudent(nn.Module):
    """Progressive refinement over straight skip-convs (reference :302-386)."""

    layers_per_stage: Sequence[int] = (3, 3, 3)
    num_heatmaps: int = 17
    ae_dims: int = 1
    trainable_stem: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, out_hw=None,
                 train: bool = False) -> jax.Array:
        stem_out = StemHRNet(dtype=self.dtype, name="stem")(x, train)
        stem_out = _frozen(stem_out, self.trainable_stem)
        ch = STEM_OUT_CHANS
        out_ch = self.num_heatmaps + self.ae_dims
        stages = []
        for i, l in enumerate(self.layers_per_stage):
            last = i == len(self.layers_per_stage) - 1
            stages.append(straight_skip_conv(
                l, ch, out_ch if last else ch, self.dtype, f"stage{i}"))
        x = stages[0](stem_out, train)
        for s in stages[1:]:
            x = s(stem_out + x, train)
        if out_hw is not None:
            x = resize_bilinear(x, tuple(out_hw), align_corners=True)
        return x


class MultistageStudent(nn.Module):
    """Intermediate-supervision student (reference :389-498); returns the
    list of per-stage outputs."""

    layers_per_stage: Sequence[int] = (3, 3, 3)
    num_heatmaps: int = 17
    ae_dims: int = 1
    trainable_stem: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, out_hw=None,
                 train: bool = False) -> Tuple[jax.Array, ...]:
        stem_out = StemHRNet(dtype=self.dtype, name="stem")(x, train)
        stem_out = _frozen(stem_out, self.trainable_stem)
        if out_hw is not None:
            stem_out = resize_bilinear(stem_out, tuple(out_hw),
                                       align_corners=True)
        stem_ch = STEM_OUT_CHANS
        out_ch = self.num_heatmaps + self.ae_dims
        cat_ch = out_ch + stem_ch

        stage_outs = []
        for i, l in enumerate(self.layers_per_stage):
            out_chans = [cat_ch] * (l - 1) + [out_ch]
            stage = SkipConv(out_chans=tuple(out_chans),
                             ksizes=(3,) * l, strides=(1,) * l,
                             dilations=(1,) * l, paddings=(1,) * l,
                             downsample_chans=out_ch,
                             dtype=self.dtype, name=f"stage{i}")
            if i == 0:
                y = stage(stem_out, train)
            else:
                y = stage(jnp.concatenate([stem_out, stage_outs[-1]],
                                          axis=-1), train)
            if out_hw is not None:
                y = resize_bilinear(y, tuple(out_hw), align_corners=True)
            stage_outs.append(y)
        return tuple(stage_outs)


class CamStudent(nn.Module):
    """Parallel CAM accumulation student (reference :502-592)."""

    inplanes: int = 48
    num_stages: int = 3
    num_heatmaps: int = 17
    ae_dims: int = 1
    trainable_stem: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, out_hw=None,
                 train: bool = False) -> Tuple[jax.Array, ...]:
        stem_out = StemHRNet(dtype=self.dtype, name="stem")(x, train)
        # quirk: reference runs mid_stem inside the same no_grad block as
        # the stem (students.py:576-578), so it never receives gradients
        s = conv(self.inplanes, 3, 1, 1, dtype=self.dtype,
                 name="mid_stem_conv")(stem_out)
        s = batch_norm(name="mid_stem_bn")(s, use_running_average=not train)
        s = nn.relu(s.astype(self.dtype))
        s = _frozen(s, self.trainable_stem)

        dil = (1, 2, 3, 5, 8, 12)
        x = ContextAwareModule(self.inplanes, dil, dtype=self.dtype,
                               name="cam0")(s, train)
        for i in range(1, self.num_stages):
            x = x + ContextAwareModule(self.inplanes, dil, dtype=self.dtype,
                                       name=f"cam{i}")(s, train)
        out = conv(self.num_heatmaps + self.ae_dims, 3, 1, 1, bias=True,
                   dtype=self.dtype, name=f"hm_conv{self.num_stages - 1}")(x)
        if out_hw is not None:
            out = resize_bilinear(out, tuple(out_hw), align_corners=True)
        return (out,)


class _CamPyramid(nn.Module):
    """Three-scale CAM pyramid used by attention/detection bodies
    (reference :652-706).  ``lo`` is computed from ``mid``'s output and
    both are nearest-upsampled back to full resolution.

    quirk: the reference overwrites its ``mid`` variable with the
    upsampled ``lo`` (students.py:739-743,998-1001), so the fused output
    is ``hi + 2 * upsample(lo)``; reproduced here.
    """

    chans: int
    hdc_dilations: Sequence[int]
    dtype: Dtype = jnp.float32
    remat: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hw = x.shape[1:3]
        CAM = _cam_cls(self.remat)
        fused = self.fused and not self.remat
        hi = CAM(self.chans, self.hdc_dilations, fused=fused,
                 dtype=self.dtype, name="hi")(x, train)
        mid_in = avg_pool(x, 3, 2, 1, count_include_pad=False)
        mid = CAM(self.chans, self.hdc_dilations, fused=fused,
                  dtype=self.dtype, name="mid")(mid_in, train)
        lo_in = avg_pool(mid, 3, 2, 1, count_include_pad=False)
        lo = CAM(self.chans, self.hdc_dilations, fused=fused,
                 dtype=self.dtype, name="lo")(lo_in, train)
        lo_up = resize_nearest(lo, tuple(hw))
        return hi + lo_up + lo_up


class AttentionStudent(nn.Module):
    """Attention + detection dual-head student (reference :595-781)."""

    inplanes: int = 48
    num_heatmaps: int = 17
    ae_dims: int = 1
    trainable_stem: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, out_hw=None,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        stem_out = StemHRNet(dtype=self.dtype, name="stem")(x, train)
        mid_ch = (STEM_OUT_CHANS + self.inplanes) // 2
        s = conv(mid_ch, 3, 1, 1, dtype=self.dtype,
                 name="mid_stem_conv0")(stem_out)
        s = batch_norm(name="mid_stem_bn0")(s, use_running_average=not train)
        s = nn.relu(s.astype(self.dtype))
        s = conv(self.inplanes, 3, 1, 1, dtype=self.dtype,
                 name="mid_stem_conv1")(s)
        s = batch_norm(name="mid_stem_bn1")(s, use_running_average=not train)
        s = nn.relu(s.astype(self.dtype))
        s = _frozen(s, self.trainable_stem)

        att = _CamPyramid(self.inplanes, (1, 2, 3, 4, 5), dtype=self.dtype,
                          name="att")(s, train)
        att = conv(1, 3, 1, 1, bias=True, dtype=self.dtype,
                   name="att_top")(att)
        att = nn.sigmoid(att.astype(jnp.float32) / 20.0).astype(self.dtype)
        s = s + att  # broadcast add (reference :756)

        # quirk: the reference's detection pyramid ignores det_mid and
        # runs det_hi twice (students.py:759-760); equivalent fused form:
        hw = s.shape[1:3]
        hi = ContextAwareModule(self.inplanes, (1, 2, 3, 4),
                                dtype=self.dtype, name="det_hi")(s, train)
        lo_in = avg_pool(hi, 3, 2, 1, count_include_pad=False)
        lo = ContextAwareModule(self.inplanes, (1, 2, 3, 4),
                                dtype=self.dtype, name="det_lo")(lo_in, train)
        lo_up = resize_nearest(lo, tuple(hw))
        det = hi + lo_up + lo_up
        det = conv(self.num_heatmaps + self.ae_dims, 3, 1, 1, bias=True,
                   dtype=self.dtype, name="det_top")(det)
        return att, det


class AttentionStudentSteps(nn.Module):
    """The flagship student trained by ``distillation.py``
    (reference :786-1073).

    Inputs: ``x`` the normalized RGB image, ``alt`` the LAB/HSV version.
    Returns ``(att, det)``: the sigmoided attention map (B, H/4, W/4, 1)
    and detection heatmap logits (B, H/4, W/4, num_heatmaps + ae_dims).
    """

    inplanes: int = 80
    num_heatmaps: int = 17
    ae_dims: int = 0
    alt_planes: int = 50
    trainable_stem: bool = False
    # During training the reference steps its attention optimizer before
    # the detection backward, so detection-loss gradients into the
    # attention branch are computed but never applied
    # (distillation.py:326-336).  Setting this detaches the attention map
    # on the detection path, reproducing the *effective* update rule in a
    # single backward pass.
    detach_att_for_det: bool = False
    dtype: Dtype = jnp.float32
    # remat the CAM blocks (att pyramid + step0-2): backward recomputes
    # block internals instead of streaming them from HBM (see _cam_cls)
    remat: bool = False
    # route train-mode CAM applications through the fused Pallas
    # kernels (ops/pallas_cam.py) — identical params, ~4x less HBM
    # traffic on the roofline-bound train step; ignored under remat
    fused_cam: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, alt: jax.Array, out_hw=None,
                 att_divisor: Optional[jax.Array] = None,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        stem_out = StemHRNet(dtype=self.dtype, name="stem")(x, train)
        mid_ch = (STEM_OUT_CHANS + self.inplanes) // 2
        s = conv(mid_ch, 3, 1, 1, dtype=self.dtype,
                 name="mid_stem_conv0")(stem_out)
        s = batch_norm(name="mid_stem_bn0")(s, use_running_average=not train)
        s = nn.relu(s.astype(self.dtype))
        s = conv(self.inplanes, 3, 1, 1, dtype=self.dtype,
                 name="mid_stem_conv1")(s)
        s = batch_norm(name="mid_stem_bn1")(s, use_running_average=not train)
        s = nn.relu(s.astype(self.dtype))
        # quirk: mid_stem sits inside the frozen-stem no_grad block
        # (students.py:978-980), so it is frozen with the stem
        s = _frozen(s, self.trainable_stem)

        # alt-image stem (trainable; outside no_grad, students.py:982)
        a = conv(self.alt_planes, 5, 2, 2, dtype=self.dtype,
                 name="alt_stem_conv0")(alt.astype(self.dtype))
        a = batch_norm(name="alt_stem_bn0")(a, use_running_average=not train)
        a = nn.relu(a.astype(self.dtype))
        a = conv(self.inplanes, 5, 2, 2, dtype=self.dtype,
                 name="alt_stem_conv1")(a)
        a = batch_norm(name="alt_stem_bn1")(a, use_running_average=not train)
        alt_stem_out = nn.relu(a.astype(self.dtype))

        # concat bilinear-resized alt image (align_corners=False,
        # students.py:989-992) to the stem features
        hw = s.shape[1:3]
        alt_small = jax.lax.stop_gradient(
            resize_bilinear(alt.astype(self.dtype), tuple(hw),
                            align_corners=False))
        s = jnp.concatenate([s, alt_small], axis=-1)  # inplanes + 3

        # attention pyramid
        att = _CamPyramid(self.inplanes + 3, (1, 2, 3, 4), dtype=self.dtype,
                          remat=self.remat, fused=self.fused_cam,
                          name="att")(s, train)
        att = conv(1, 3, 1, 1, bias=True, dtype=self.dtype,
                   name="att_top")(att)
        att = att.astype(jnp.float32)
        if att_divisor is not None:
            att = att / att_divisor
        att = nn.sigmoid(att)

        att_for_det = (jax.lax.stop_gradient(att)
                       if self.detach_att_for_det else att)
        s = s * att_for_det.astype(self.dtype)
        s = jnp.concatenate([s, alt_stem_out], axis=-1)  # 2*inplanes + 3

        for i in range(3):
            s = _cam_cls(self.remat)(2 * self.inplanes + 3, (1, 2, 3),
                                     dtype=self.dtype,
                                     fused=(self.fused_cam
                                            and not self.remat),
                                     name=f"step{i}")(s, train)
        det = conv(self.num_heatmaps + self.ae_dims, 3, 1, 1, bias=True,
                   dtype=self.dtype, name="det_top")(s)
        return att, det
