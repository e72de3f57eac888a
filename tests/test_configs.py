"""Config tree: YAML round-trip and reference-default fidelity."""

import numpy as np

import jax.numpy as jnp


def test_yaml_roundtrip(tmp_path):
    from rtpe_tpu.configs import (
        FrameworkConfig,
        load_yaml,
        save_yaml,
        to_dict,
    )
    cfg = FrameworkConfig()
    p = str(tmp_path / "cfg.yaml")
    save_yaml(cfg, p)
    cfg2 = load_yaml(p)
    assert to_dict(cfg) == to_dict(cfg2)
    assert cfg2.model.stage4.num_channels == (48, 96, 192, 384)


def test_defaults_match_reference_globals():
    """Spot-check against the reference's live globals
    (distillation.py:49-101, validate_hhrnet.py, helpers.py:32-67)."""
    from rtpe_tpu.configs import FrameworkConfig
    cfg = FrameworkConfig()
    assert cfg.model.num_joints == 17
    assert cfg.model.deconv_chans == (48,)
    assert cfg.decode.max_num_people == 30
    assert cfg.decode.detection_threshold == 0.1
    assert cfg.distill.distillation_alpha == 0.8
    assert cfg.distill.det_pos_weight == 100.0
    assert cfg.distill.att_pos_weight == 7.0
    assert cfg.distill.att_sgdr.max_lr == 0.025
    assert cfg.distill.att_sgdr.period == 700.0
    assert cfg.augment.max_rotation_deg == 45.0
    assert cfg.augment.scale_range == (0.7, 1.3)
    assert cfg.data.train_hw == (450, 450)
    assert cfg.data.train_gt_stddevs == (7.0,)


def test_bn_compute_dtype_switch():
    """The bf16-BN switch changes compute dtype without touching params
    and restores cleanly."""
    import jax

    from rtpe_tpu.models import StemHRNet, layers

    x = jnp.ones((1, 32, 32, 3))
    m = StemHRNet(dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x)
    base = np.asarray(m.apply(v, x), np.float32)
    try:
        layers.set_bn_compute_dtype(jnp.bfloat16)
        fast = np.asarray(m.apply(v, x), np.float32)
    finally:
        layers.set_bn_compute_dtype(jnp.float32)
    # same params usable; outputs agree within bf16 tolerance
    assert np.abs(fast - base).max() / (np.abs(base).max() + 1e-9) < 0.05
