"""Real-weights parity: the reference's bundled pretrained attention
snapshot (``assets/pretrained_segm_4MB``, AttentionStudent inplanes=100)
loaded through our importer must reproduce the torch model's attention
output on the same input.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from conftest import REFERENCE_PATH, add_reference_to_path, has_reference

SNAP_DIR = os.path.join(REFERENCE_PATH, "assets", "pretrained_segm_4MB")
SNAP_PREFIX = "17_May_2020_19:48:38.493_epoch11_step3001"

pytestmark = pytest.mark.skipif(
    not (has_reference() and os.path.isdir(SNAP_DIR)),
    reason="pretrained snapshot not mounted")


@pytest.mark.slow
def test_attention_steps_full_statedict_parity():
    """Full-model parity for the flagship AttentionStudentSteps: torch
    statedict -> flax via the complete importer; (att, det) outputs must
    agree, including the attention-divisor path."""
    add_reference_to_path()
    from rtpe.students import AttentionStudentSteps as TorchSteps

    from rtpe_tpu.io.torch_import import import_attention_steps_statedict
    from rtpe_tpu.models import AttentionStudentSteps

    torch.manual_seed(3)
    tm = TorchSteps(hhrnet_statedict_path=None, device="cpu",
                    inplanes=80, num_heatmaps=17, ae_dims=0,
                    half_precision=False,
                    init_fn=torch.nn.init.kaiming_normal_,
                    trainable_stem=False)
    tm.eval()
    g = torch.Generator().manual_seed(4)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    fm = AttentionStudentSteps(inplanes=80, num_heatmaps=17, ae_dims=0,
                               dtype=jnp.float32)
    x_np = np.random.RandomState(5).rand(1, 96, 128, 3).astype(np.float32)
    a_np = np.random.RandomState(6).rand(1, 96, 128, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                        jnp.asarray(a_np), train=False)
    variables = import_attention_steps_statedict(variables, sd)

    with torch.no_grad():
        att_t, det_t = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)),
                          alt=torch.from_numpy(a_np.transpose(0, 3, 1, 2)),
                          att_divisor=13.0)
    att_j, det_j = fm.apply(variables, jnp.asarray(x_np),
                            jnp.asarray(a_np),
                            att_divisor=jnp.float32(13.0), train=False)

    np.testing.assert_allclose(
        np.asarray(att_j).transpose(0, 3, 1, 2), att_t.numpy(),
        rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(det_j).transpose(0, 3, 1, 2), det_t.numpy(),
        rtol=1e-3, atol=5e-4)


def _randomize_bn(tm, seed):
    g = torch.Generator().manual_seed(seed)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3, generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


@pytest.mark.parametrize("arch", ["cam", "refiner", "multistage"])
def test_legacy_student_full_statedict_parity(arch):
    add_reference_to_path()
    from rtpe.students import (
        CamStudent as TCam,
        MultistageStudent as TMulti,
        RefinerStudent as TRef,
    )

    from rtpe_tpu.io.torch_import import import_student_statedict
    from rtpe_tpu.models import CamStudent, MultistageStudent, RefinerStudent

    torch.manual_seed(7)
    common = dict(hhrnet_statedict_path=None, device="cpu",
                  num_heatmaps=17, ae_dims=1, half_precision=False,
                  init_fn=torch.nn.init.kaiming_normal_,
                  trainable_stem=False)
    if arch == "cam":
        tm = TCam(inplanes=48, num_stages=3, **common)
        fm = CamStudent(inplanes=48, num_stages=3, num_heatmaps=17,
                        ae_dims=1, dtype=jnp.float32)
    elif arch == "refiner":
        tm = TRef(layers_per_stage=[2, 2], **common)
        fm = RefinerStudent(layers_per_stage=(2, 2), num_heatmaps=17,
                            ae_dims=1, dtype=jnp.float32)
    else:
        # reference bug: MultistageStudent.__init__ invokes
        # RefinerStudent.__init__() with its device="cuda" defaults
        # (students.py:405), crashing on CPU-only torch; bypass the
        # parent init for construction
        import rtpe.students as rstud
        orig_init = rstud.RefinerStudent.__init__
        rstud.RefinerStudent.__init__ = torch.nn.Module.__init__
        try:
            tm = TMulti(layers_per_stage=[2, 2], **common)
        finally:
            rstud.RefinerStudent.__init__ = orig_init
        fm = MultistageStudent(layers_per_stage=(2, 2), num_heatmaps=17,
                               ae_dims=1, dtype=jnp.float32)
    tm.eval()
    _randomize_bn(tm, 8)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    x_np = np.random.RandomState(9).rand(1, 64, 96, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                        train=False)
    variables = import_student_statedict(variables, sd, arch)

    with torch.no_grad():
        want = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    got = fm.apply(variables, jnp.asarray(x_np), train=False)
    want = want if isinstance(want, (list, tuple)) else [want]
    got = got if isinstance(got, (list, tuple)) else [got]
    assert len(want) == len(got)
    for w_t, g_j in zip(want, got):
        np.testing.assert_allclose(
            np.asarray(g_j).transpose(0, 3, 1, 2), w_t.numpy(),
            rtol=1e-3, atol=5e-4)


def test_attention_student_full_statedict_parity():
    """Full-model parity for AttentionStudent (both heads), covering
    the det_hi-twice / mid-overwrite forward quirks."""
    add_reference_to_path()
    from rtpe.students import AttentionStudent as TorchAttention

    from rtpe_tpu.io.torch_import import import_attention_student_statedict
    from rtpe_tpu.models import AttentionStudent

    torch.manual_seed(11)
    tm = TorchAttention(hhrnet_statedict_path=None, device="cpu",
                        inplanes=48, num_heatmaps=17, ae_dims=1,
                        half_precision=False,
                        init_fn=torch.nn.init.kaiming_normal_,
                        trainable_stem=False)
    tm.eval()
    _randomize_bn(tm, 12)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    fm = AttentionStudent(inplanes=48, num_heatmaps=17, ae_dims=1,
                          dtype=jnp.float32)
    x_np = np.random.RandomState(13).rand(1, 64, 96, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                        train=False)
    variables = import_attention_student_statedict(variables, sd)

    with torch.no_grad():
        att_t, det_t = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    att_j, det_j = fm.apply(variables, jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(
        np.asarray(att_j).transpose(0, 3, 1, 2), att_t.numpy(),
        rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(det_j).transpose(0, 3, 1, 2), det_t.numpy(),
        rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_attention_student_real_snapshot_parity():
    add_reference_to_path()
    from rtpe.students import AttentionStudent as TorchAttentionStudent

    from rtpe_tpu.io.torch_import import (
        import_attention_student_parts,
        import_stem_statedict,
    )
    from rtpe_tpu.models import AttentionStudent

    torch.manual_seed(0)
    tm = TorchAttentionStudent(hhrnet_statedict_path=None, device="cpu",
                               inplanes=100, num_heatmaps=17, ae_dims=1,
                               half_precision=False,
                               init_fn=torch.nn.init.kaiming_normal_,
                               trainable_stem=False)
    tm.load_state_dicts(os.path.join(SNAP_DIR, SNAP_PREFIX))
    tm.eval()

    fm = AttentionStudent(inplanes=100, num_heatmaps=17, ae_dims=1,
                          dtype=jnp.float32)
    x_np = np.random.RandomState(1).rand(1, 96, 128, 3).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x_np),
                        train=False)

    # share the (random) stem: export the torch stem as a statedict with
    # the fp16-wrapper prefix our stem importer expects
    stem_sd = {("1." + k): v.detach().numpy()
               for k, v in tm.stem[1].state_dict().items()
               if not k.endswith("num_batches_tracked")}
    variables = import_stem_statedict(variables, stem_sd)
    # load the real pretrained attention parts
    variables = import_attention_student_parts(variables, SNAP_DIR,
                                               SNAP_PREFIX)

    with torch.no_grad():
        att_t, _ = tm(torch.from_numpy(x_np.transpose(0, 3, 1, 2)))
    att_j, _ = fm.apply(variables, jnp.asarray(x_np), train=False)

    att_t = att_t.numpy()                      # (1, 1, h, w), sigmoided
    att_j = np.asarray(att_j).transpose(0, 3, 1, 2)
    assert att_t.shape == att_j.shape
    np.testing.assert_allclose(att_j, att_t, rtol=1e-3, atol=2e-4)
    # the real weights produce a non-degenerate attention map
    assert att_t.std() > 1e-4
