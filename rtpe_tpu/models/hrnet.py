"""HigherHRNet teacher, TPU-native Flax build.

Architecture reproduced from the behavior of
``rtpe/third_party/pose_higher_hrnet.py:259-686`` (HigherHRNet-W48:
stem -> 4-stage multi-resolution trunk -> 1x1 final conv (17 hm + 17 AE)
-> cat -> 4x4/s2 deconv + 4 BasicBlocks -> 1x1 final conv (17 hm)).

Forward returns ``(coarse, refined)``:

* ``coarse``  — (B, H/4, W/4, num_joints + ae_dims) heatmaps+tags
* ``refined`` — (B, H/2, W/2, num_joints) higher-resolution heatmaps

Layout is NHWC and compute dtype is configurable (bf16 for TPU, fp32 for
parity tests).
"""

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BLOCK_TYPES, BasicBlock, Bottleneck, HighResolutionModule
from .layers import TorchConvTranspose, batch_norm, conv

Dtype = Any


@dataclasses.dataclass(frozen=True)
class StageCfg:
    num_modules: int
    num_branches: int
    block: str
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class HRNetConfig:
    """Mirrors the constructor surface of the reference model
    (``pose_higher_hrnet.py:266-287`` and the legacy cfg schema comment
    ``legacy/distillation.py:36-95``)."""

    num_joints: int = 17
    tag_per_joint: bool = True
    final_conv_ksize: int = 1
    inplanes: int = 64
    stage2: StageCfg = StageCfg(1, 2, "BASIC", (4, 4), (48, 96))
    stage3: StageCfg = StageCfg(4, 3, "BASIC", (4, 4, 4), (48, 96, 192))
    stage4: StageCfg = StageCfg(3, 4, "BASIC", (4, 4, 4, 4),
                                (48, 96, 192, 384))
    num_deconvs: int = 1
    deconv_chans: Tuple[int, ...] = (48,)
    deconv_ksize: Tuple[int, ...] = (4,)
    deconv_num_blocks: int = 4
    deconv_cat: Tuple[bool, ...] = (True,)
    with_ae_loss: Tuple[bool, ...] = (True, False)

    @property
    def ae_dims(self) -> int:
        return self.num_joints if self.tag_per_joint else 1


def w48_config() -> HRNetConfig:
    """The exact teacher configuration of ``rtpe/helpers.py:32-67``."""
    return HRNetConfig()


class PoseHigherHRNet(nn.Module):
    """HigherHRNet; see module docstring."""

    cfg: HRNetConfig = dataclasses.field(default_factory=w48_config)
    dtype: Dtype = jnp.float32

    def _transition(self, xs, pre_chans, cur_chans, t_idx, train):
        """Reference ``_make_transition_layer`` (:548-583): per-branch 3x3
        conv-bn-relu when channels change, identity otherwise; new branches
        are strided chains from the last previous branch."""
        outs = []
        for i, cur in enumerate(cur_chans):
            if i < len(pre_chans):
                if cur != pre_chans[i]:
                    y = conv(cur, 3, 1, 1, dtype=self.dtype,
                             name=f"transition{t_idx}_{i}_conv")(xs[i])
                    y = batch_norm(name=f"transition{t_idx}_{i}_bn")(
                        y, use_running_average=not train)
                    y = nn.relu(y.astype(self.dtype))
                else:
                    y = xs[i]
            else:
                y = xs[-1]
                for j in range(i + 1 - len(pre_chans)):
                    feats = cur if j == i - len(pre_chans) else pre_chans[-1]
                    y = conv(feats, 3, 2, 1, dtype=self.dtype,
                             name=f"transition{t_idx}_{i}_{j}_conv")(y)
                    y = batch_norm(name=f"transition{t_idx}_{i}_{j}_bn")(
                        y, use_running_average=not train)
                    y = nn.relu(y.astype(self.dtype))
            outs.append(y)
        return outs

    def _stage(self, xs, scfg: StageCfg, s_idx, multi_scale_output, train):
        exp = BLOCK_TYPES[scfg.block].expansion
        out_chans = [c * exp for c in scfg.num_channels]
        inchans = list(out_chans)
        for m in range(scfg.num_modules):
            mso = multi_scale_output or m < scfg.num_modules - 1
            xs = HighResolutionModule(
                num_branches=scfg.num_branches,
                block=scfg.block,
                num_blocks=tuple(scfg.num_blocks),
                num_inchannels=tuple(inchans),
                num_channels=tuple(scfg.num_channels),
                multi_scale_output=mso,
                dtype=self.dtype,
                name=f"stage{s_idx}_{m}",
            )(xs, train)
        return list(xs), out_chans

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        x = x.astype(self.dtype)

        # stem (reference :362-370, :637-644)
        x = conv(64, 3, 2, 1, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(name="bn1")(x, use_running_average=not train)
        x = nn.relu(x.astype(self.dtype))
        x = conv(64, 3, 2, 1, dtype=self.dtype, name="conv2")(x)
        x = batch_norm(name="bn2")(x, use_running_average=not train)
        x = nn.relu(x.astype(self.dtype))
        for i in range(4):
            x = Bottleneck(64, 1, i == 0, dtype=self.dtype,
                           name=f"layer1_{i}")(x, train)

        # stages (reference :646-670)
        s2_chans = [c * BLOCK_TYPES[cfg.stage2.block].expansion
                    for c in cfg.stage2.num_channels]
        xs = self._transition([x], [256], s2_chans, 1, train)
        xs, pre = self._stage(xs, cfg.stage2, 2, True, train)

        s3_chans = [c * BLOCK_TYPES[cfg.stage3.block].expansion
                    for c in cfg.stage3.num_channels]
        xs = self._transition(xs, pre, s3_chans, 2, train)
        xs, pre = self._stage(xs, cfg.stage3, 3, True, train)

        s4_chans = [c * BLOCK_TYPES[cfg.stage4.block].expansion
                    for c in cfg.stage4.num_channels]
        xs = self._transition(xs, pre, s4_chans, 3, train)
        xs, pre = self._stage(xs, cfg.stage4, 4, False, train)

        # heads (reference :672-686)
        ae_dims = cfg.ae_dims
        x = xs[0]
        out0_ch = cfg.num_joints + (ae_dims if cfg.with_ae_loss[0] else 0)
        fk = cfg.final_conv_ksize
        y = conv(out0_ch, fk, 1, 1 if fk == 3 else 0, bias=True,
                 dtype=self.dtype, name="final_0")(x)
        outputs = [y]

        for i in range(cfg.num_deconvs):
            if cfg.deconv_cat[i]:
                x = jnp.concatenate([x, y], axis=-1)
            x = TorchConvTranspose(cfg.deconv_chans[i], cfg.deconv_ksize[i],
                                   2, 1, dtype=self.dtype,
                                   name=f"deconv{i}_tconv")(x)
            x = batch_norm(name=f"deconv{i}_bn")(
                x, use_running_average=not train)
            x = nn.relu(x.astype(self.dtype))
            for b in range(cfg.deconv_num_blocks):
                x = BasicBlock(cfg.deconv_chans[i], 1, False,
                               dtype=self.dtype,
                               name=f"deconv{i}_block{b}")(x, train)
            ch = cfg.num_joints + (ae_dims if cfg.with_ae_loss[i + 1] else 0)
            y = conv(ch, fk, 1, 1 if fk == 3 else 0, bias=True,
                     dtype=self.dtype, name=f"final_{i + 1}")(x)
            outputs.append(y)

        return tuple(outputs)
