"""Fused Pallas CAM vs the unfused flax ContextAwareModule.

The fused path (ops/pallas_cam.py) must read the identical parameter
tree, produce the same train-mode output, the same running-stat
updates, and the same gradients (to bf16 tolerance — the fused kernels
do their stat/normalization arithmetic in f32 while the unfused path
normalizes in the BN compute dtype).

These run the kernels in interpret mode on CPU (rtpe_tpu forces the
CPU backend under the test env; `_interpret()` keys off it).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtpe_tpu.models.students import ContextAwareModule


def _mods(fused, chans=12, dils=(1, 2, 3)):
    return ContextAwareModule(chans=chans, hdc_dilations=dils,
                              dtype=jnp.bfloat16, fused=fused)


def _data(rng, b=2, hw=21, chans=12):
    return jnp.asarray(rng.rand(b, hw, hw, chans).astype(np.float32)
                       ).astype(jnp.bfloat16)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    x = _data(rng)
    ref = _mods(False)
    fus = _mods(True)
    variables = ref.init(jax.random.PRNGKey(3), x, train=False)
    return x, ref, fus, variables


def test_fused_init_creates_identical_tree(setup):
    x, ref, fus, variables = setup
    # initializing THROUGH the fused module must build the same tree
    v2 = fus.init(jax.random.PRNGKey(3), x, train=False)
    jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        variables, v2))


def test_fused_forward_and_stats_match(setup):
    x, ref, fus, variables = setup
    out_r, mut_r = ref.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    out_f, mut_f = fus.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    a = np.asarray(out_r, np.float32)
    b = np.asarray(out_f, np.float32)
    np.testing.assert_allclose(a, b, rtol=0, atol=0.05)
    assert np.mean(np.abs(a - b)) < 5e-3
    flat_r = jax.tree_util.tree_leaves_with_path(mut_r["batch_stats"])
    flat_f = dict(jax.tree_util.tree_leaves_with_path(
        mut_f["batch_stats"]))
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_f[path]),
            rtol=2e-2, atol=2e-3, err_msg=str(path))


def test_fused_gradients_match(setup):
    x, ref, fus, variables = setup
    tgt = jnp.asarray(np.random.RandomState(7).rand(
        *x.shape).astype(np.float32))

    def loss(params, model, xx):
        out, _ = model.apply(
            {"params": params,
             "batch_stats": variables["batch_stats"]},
            xx, train=True, mutable=["batch_stats"])
        return jnp.mean(jnp.square(out.astype(jnp.float32) - tgt))

    gr = jax.grad(loss)(variables["params"], ref, x)
    gf = jax.grad(loss)(variables["params"], fus, x)

    def check(a, b, path):
        # bf16 accumulation-order noise allows isolated ~10%-of-max
        # outliers; require per-element closeness at 0.15 * max,
        # small mean error, and near-perfect direction alignment
        a = np.asarray(a, np.float32).ravel()
        b = np.asarray(b, np.float32).ravel()
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, rtol=0,
                                   atol=0.15, err_msg=str(path))
        assert np.mean(np.abs(a - b)) / scale < 0.02, path
        cos = np.dot(a, b) / max(np.linalg.norm(a)
                                 * np.linalg.norm(b), 1e-12)
        assert cos > 0.995, (path, cos)

    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, leaf in jax.tree_util.tree_leaves_with_path(gr):
        check(leaf, flat_f[path], path)

    gxr = jax.grad(lambda xx: loss(variables["params"], ref, xx))(x)
    gxf = jax.grad(lambda xx: loss(variables["params"], fus, xx))(x)
    check(gxr, gxf, "x")


def test_fused_eval_mode_uses_unfused_path(setup):
    x, ref, fus, variables = setup
    out_r = ref.apply(variables, x, train=False)
    out_f = fus.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_r, np.float32),
                                  np.asarray(out_f, np.float32))


@pytest.mark.slow
def test_fused_cam_full_student_grads_finite():
    """``AttentionStudentSteps(fused_cam=True)`` composes end-to-end:
    the jitted gradient of a full student forward (att pyramid at three
    scales + step0-2, every CAM through the fused kernels) is finite,
    and the parameter tree is identical to the unfused module's."""
    from rtpe_tpu.models.students import AttentionStudentSteps

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.bfloat16)
    alt = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.bfloat16)
    m = AttentionStudentSteps(inplanes=16, fused_cam=True,
                              dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), x, alt, train=False)
    m0 = AttentionStudentSteps(inplanes=16, dtype=jnp.bfloat16)
    v0 = m0.init(jax.random.PRNGKey(0), x, alt, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v0))

    def loss(p):
        (att, det), _ = m.apply(
            {"params": p, "batch_stats": v["batch_stats"]},
            x, alt, train=True, mutable=["batch_stats"])
        return (jnp.mean(jnp.square(det.astype(jnp.float32)))
                + jnp.mean(att.astype(jnp.float32) ** 2))

    g = jax.jit(jax.grad(loss))(v["params"])
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert bool(jnp.all(jnp.isfinite(leaf))), path
