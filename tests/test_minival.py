"""In-training minival: batched attention BCE exactness + detection AP.

VERDICT r1 item 8: the attention minival must be batched (it was an
un-jitted bs=1 loop) and a detection AP minival must run in-training
for AE-carrying students.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_data_eval import _make_coco_fixture
from test_e2e_ap import _render_ideal

from rtpe_tpu.data import CocoDistillationDataset
from rtpe_tpu.eval.minival import attention_minival, detection_minival
from rtpe_tpu.models import AttentionStudentSteps


@pytest.fixture(scope="module")
def fixture_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("minival_coco"))
    _make_coco_fixture(root, n_imgs=3, hw=(96, 128),
                       jitter_per_image=True)
    return CocoDistillationDataset(root, "val2017",
                                   remove_images_without_annotations=False,
                                   gt_stddevs_pix=[2.0],
                                   alt_colorspace="LAB")


@pytest.mark.slow
def test_attention_minival_batched_equals_bs1(fixture_ds):
    from rtpe_tpu.data.preprocess import normalize_image
    from rtpe_tpu.ops.resize import resize_bilinear
    from rtpe_tpu.train import bce_with_logits

    model = AttentionStudentSteps(inplanes=8, num_heatmaps=17, ae_dims=0,
                                  alt_planes=6, dtype=jnp.float32)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x0, x0, train=False)

    got = attention_minival(model, v["params"], v["batch_stats"],
                            fixture_ds, batch_size=2)

    # reference: the round-1 bs=1 loop
    losses = []
    for i in range(len(fixture_ds)):
        s = fixture_ds[i]
        att, _ = model.apply(v, jnp.asarray(normalize_image(s["img"])[None]),
                             jnp.asarray(s["img_alt"][None]), train=False)
        segm = resize_bilinear(
            jnp.asarray(s["segm_mask"][None, :, :, None]),
            att.shape[1:3], align_corners=False)
        losses.append(float(bce_with_logits(att, segm, 7.0)))
    want = float(np.mean(losses))
    assert got == pytest.approx(want, rel=1e-5)


class _OracleStudent:
    """Model shim emitting ideal detection heatmaps+tags at image
    resolution (the engine-isolation strategy of test_e2e_ap), so the
    detection-minival machinery can be asserted to reach AP@.5 = 1.

    Batch-aware AND jit-traceable: ``detection_minival`` jits the
    forward and batches bucketed chunks with padded tails, so call
    order no longer identifies the image and the row choice must be a
    traced function of the input.  Each row is matched to its sample by
    the pixel sum of its normalized image (distinct random images ->
    distinct sums), then the ideal maps are gathered from a
    precomputed table.
    """

    def __init__(self, dataset, num_joints=17):
        from rtpe_tpu.data.preprocess import normalize_image

        self.num_joints = num_joints
        samples = [dataset[i] for i in range(len(dataset))]
        self._sums = np.array(
            [float(normalize_image(s["img"]).astype(np.float32).sum())
             for s in samples], np.float32)
        assert len(np.unique(self._sums)) == len(samples), \
            "fixture images must have distinct pixel sums"
        table = []
        for s in samples:
            det, tag = _render_ideal(s["joints"], s["mask"].shape,
                                     self.num_joints)
            table.append(np.concatenate([det, tag], axis=-1))
        self._table = np.stack(table).astype(np.float32)

    def apply(self, variables, img, alt, train=False):
        key = jnp.sum(img.astype(jnp.float32), axis=(1, 2, 3))  # (B,)
        idx = jnp.argmin(jnp.abs(key[:, None]
                                 - jnp.asarray(self._sums)[None, :]),
                         axis=1)
        out = jnp.asarray(self._table)[idx]
        att = jnp.zeros((img.shape[0], out.shape[1] // 4,
                         out.shape[2] // 4, 1))
        return att, out


def test_detection_minival_reaches_ap(fixture_ds):
    oracle = _OracleStudent(fixture_ds)
    stats = detection_minival(oracle, {}, {}, fixture_ds)
    assert stats["Ap .5"] == pytest.approx(1.0)
    assert stats["AP"] > 0.5


def test_detection_minival_batched_equals_bs1(fixture_ds):
    """Bucketed batching (VERDICT r2 weak 2) must not change the
    result: batched chunks with padded tails == the per-image loop."""
    oracle = _OracleStudent(fixture_ds)
    got = detection_minival(oracle, {}, {}, fixture_ds, batch_size=2)
    want = detection_minival(oracle, {}, {}, fixture_ds, batch_size=1)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-6), k


def test_detection_minival_random_student_runs(fixture_ds):
    """A real (random) AE-carrying student produces finite stats."""
    model = AttentionStudentSteps(inplanes=8, num_heatmaps=17, ae_dims=1,
                                  alt_planes=6, dtype=jnp.float32)
    x0 = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x0, x0, train=False)
    stats = detection_minival(model, v["params"], v["batch_stats"],
                              fixture_ds, max_images=2)
    assert set(stats) == {"AP", "Ap .5", "AP .75", "AP (M)", "AP (L)",
                          "AR", "AR .5", "AR .75", "AR (M)", "AR (L)"}
    for val in stats.values():
        assert np.isfinite(val)
