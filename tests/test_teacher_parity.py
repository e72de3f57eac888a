"""Architecture parity: our Flax HigherHRNet vs the reference torch model.

Strategy (no pretrained weights ship with the environment): instantiate
the *reference* torch model with random weights, import its statedict
through our converter, and assert the fp32 forward outputs agree.  This
validates layer topology, layout conversion, BN semantics, padding and
deconv math in one shot.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, has_reference

from rtpe_tpu.io import import_teacher_statedict, import_stem_statedict
from rtpe_tpu.models import (
    HRNetConfig,
    PoseHigherHRNet,
    StageCfg,
    StemHRNet,
    w48_config,
)

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference repo not mounted")


def _torch_sd_to_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()
            if not k.endswith("num_batches_tracked")}


def _randomize_bn_stats(model, seed=0):
    """Give running stats non-trivial values so BN parity is meaningful."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.5, generator=g)
            m.running_var.uniform_(0.5, 2.0, generator=g)
            m.weight.data.normal_(1.0, 0.2, generator=g)
            m.bias.data.normal_(0.0, 0.2, generator=g)


SMALL_KW = dict(
    s2_modules=1, s2_branches=2, s2_blocks=[2, 2], s2_chans=[8, 16],
    s3_modules=2, s3_branches=3, s3_blocks=[2, 2, 2], s3_chans=[8, 16, 32],
    s4_modules=1, s4_branches=4, s4_blocks=[2, 2, 2, 2],
    s4_chans=[8, 16, 32, 64],
    deconvs=1, deconv_chans=[8], deconv_ksize=[4], deconv_num_blocks=2,
    deconv_cat=[True], with_ae_loss=(True, False), num_joints=5,
    tag_per_joint=True, final_conv_ksize=1,
)

SMALL_CFG = HRNetConfig(
    num_joints=5, tag_per_joint=True, final_conv_ksize=1,
    stage2=StageCfg(1, 2, "BASIC", (2, 2), (8, 16)),
    stage3=StageCfg(2, 3, "BASIC", (2, 2, 2), (8, 16, 32)),
    stage4=StageCfg(1, 4, "BASIC", (2, 2, 2, 2), (8, 16, 32, 64)),
    num_deconvs=1, deconv_chans=(8,), deconv_ksize=(4,),
    deconv_num_blocks=2, deconv_cat=(True,), with_ae_loss=(True, False),
)


def _parity_check(torch_model, flax_model, in_hw, atol=2e-4):
    torch_model.eval()
    _randomize_bn_stats(torch_model)
    sd = _torch_sd_to_numpy(torch_model)

    x = np.random.RandomState(42).rand(1, 3, *in_hw).astype(np.float32)
    with torch.no_grad():
        t_out = torch_model(torch.from_numpy(x))
    if isinstance(t_out, (list, tuple)):
        t_out = [o.numpy() for o in t_out]
    else:
        t_out = [t_out.numpy()]

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    template = flax_model.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    variables = import_teacher_statedict(template, sd)
    j_out = flax_model.apply(variables, x_nhwc, train=False)
    if not isinstance(j_out, (list, tuple)):
        j_out = [j_out]

    assert len(t_out) == len(j_out)
    for t, j in zip(t_out, j_out):
        j = np.transpose(np.asarray(j), (0, 3, 1, 2))
        assert t.shape == j.shape
        np.testing.assert_allclose(j, t, rtol=1e-4, atol=atol)


def test_small_hrnet_parity():
    add_reference_to_path()
    from rtpe.third_party.pose_higher_hrnet import PoseHigherResolutionNet

    torch.manual_seed(0)
    tm = PoseHigherResolutionNet(**SMALL_KW)
    fm = PoseHigherHRNet(cfg=SMALL_CFG, dtype=jnp.float32)
    _parity_check(tm, fm, (64, 96))


@pytest.mark.slow
def test_w48_teacher_parity():
    add_reference_to_path()
    from rtpe.third_party.pose_higher_hrnet import PoseHigherResolutionNet

    torch.manual_seed(1)
    tm = PoseHigherResolutionNet()  # defaults are the W48 teacher config
    fm = PoseHigherHRNet(cfg=w48_config(), dtype=jnp.float32)
    _parity_check(tm, fm, (64, 64), atol=5e-4)


def test_stem_import_matches_torch_stem():
    add_reference_to_path()
    from rtpe.students import StemHRNet as TorchStem

    torch.manual_seed(2)
    tm = TorchStem()
    tm.eval()
    _randomize_bn_stats(tm)
    sd = {("1." + k): v.detach().numpy() for k, v in tm.state_dict().items()
          if not k.endswith("num_batches_tracked")}

    x = np.random.RandomState(3).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    class Wrap(StemHRNet):
        pass

    from flax import linen as nn

    class Holder(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return StemHRNet(dtype=jnp.float32, name="stem")(x, train)

    hm = Holder()
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    template = hm.init(jax.random.PRNGKey(0), x_nhwc)
    variables = import_stem_statedict(template, sd)
    got = np.transpose(np.asarray(hm.apply(variables, x_nhwc)), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
