"""Parity tests for the core ops against torch / cv2 ground truth."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rtpe_tpu.ops import (
    affine_warp,
    avg_pool,
    get_affine_transform,
    max_pool,
    resize_bilinear,
    resize_nearest,
    rgb_to_hsv,
    rgb_to_lab,
    upsample_nearest,
)


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(*shape).astype(np.float32)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((17, 23), (40, 50)), ((64, 64), (17, 31)), ((5, 5), (5, 5)),
    ((1, 7), (3, 13)),
])
def test_resize_bilinear_matches_torch(align, in_hw, out_hw):
    x = _rand((2, *in_hw, 3))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=out_hw, mode="bilinear",
                         align_corners=align).permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((16, 16), (32, 32)), ((13, 17), (29, 37)), ((32, 32), (9, 9)),
])
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = _rand((1, *in_hw, 2))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=out_hw,
                         mode="nearest").permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_array_equal(got, want)


def test_upsample_nearest_matches_torch():
    x = _rand((2, 7, 9, 4))
    for k in (2, 4):
        want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                             scale_factor=k,
                             mode="nearest").permute(0, 2, 3, 1).numpy()
        got = np.asarray(upsample_nearest(jnp.asarray(x), k))
        np.testing.assert_array_equal(got, want)


def test_max_pool_matches_torch_nms_pool():
    # the decode NMS pool: k5 s1 p2 (reference group.py:132)
    x = _rand((2, 31, 33, 17))
    want = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                        5, 1, 2).permute(0, 2, 3, 1).numpy()
    got = np.asarray(max_pool(jnp.asarray(x), 5, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_avg_pool_no_include_pad_matches_torch():
    # the pyramid pool: k3 s2 p1 count_include_pad=False
    # (reference students.py:656-658)
    x = _rand((2, 29, 30, 8))
    want = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                        3, 2, 1,
                        count_include_pad=False).permute(0, 2, 3, 1).numpy()
    got = np.asarray(avg_pool(jnp.asarray(x), 3, 2, 1,
                              count_include_pad=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rgb_to_hsv_roundtrip_properties():
    import matplotlib.colors as mcolors
    x = _rand((5, 6, 3))
    want = mcolors.rgb_to_hsv(x)
    got = np.asarray(rgb_to_hsv(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rgb_to_lab_known_values():
    # white -> L=100, a=b=0 ; black -> 0,0,0 ; checked against skimage docs
    x = np.array([[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0],
                   [1.0, 0.0, 0.0]]], dtype=np.float32)
    lab = np.asarray(rgb_to_lab(jnp.asarray(x)))
    np.testing.assert_allclose(lab[0, 0], [100.0, 0.0, 0.0], atol=2e-2)
    np.testing.assert_allclose(lab[0, 1], [0.0, 0.0, 0.0], atol=1e-4)
    # sRGB red in Lab (D65): approx (53.24, 80.09, 67.20)
    np.testing.assert_allclose(lab[0, 2], [53.24, 80.09, 67.20], atol=0.05)


def test_get_affine_transform_matches_reference_math():
    import cv2
    center = np.array([123.0, 87.0])
    scale = np.array([1.7, 2.1])
    for rot in (0.0, 17.0, -30.0):
        for inv in (False, True):
            got = get_affine_transform(center, scale, rot, (200, 160),
                                       inv=inv)
            # recompute with cv2 exactly like transforms.py:59-93
            scale_tmp = scale * 200.0
            src_w = scale_tmp[0]
            rot_rad = np.pi * rot / 180
            sn, cs = np.sin(rot_rad), np.cos(rot_rad)
            src_dir = np.array([0 * cs - (-0.5 * src_w) * sn,
                                0 * sn + (-0.5 * src_w) * cs])
            dst_w, dst_h = 200, 160
            dst_dir = np.array([0, dst_w * -0.5], np.float32)
            src = np.zeros((3, 2), dtype=np.float32)
            dst = np.zeros((3, 2), dtype=np.float32)
            src[0, :] = center
            src[1, :] = center + src_dir
            dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
            dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
            direct = src[0] - src[1]
            src[2, :] = src[1] + np.array([-direct[1], direct[0]])
            direct = dst[0] - dst[1]
            dst[2, :] = dst[1] + np.array([-direct[1], direct[0]])
            if inv:
                want = cv2.getAffineTransform(np.float32(dst),
                                              np.float32(src))
            else:
                want = cv2.getAffineTransform(np.float32(src),
                                              np.float32(dst))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_affine_warp_matches_cv2():
    import cv2
    img = _rand((37, 45, 3))
    m = get_affine_transform((22.0, 18.0), 0.3, 25.0, (64, 48))
    want = cv2.warpAffine(img, m.astype(np.float64), (64, 48),
                          flags=cv2.INTER_LINEAR)
    got = np.asarray(affine_warp(jnp.asarray(img[None]),
                                 jnp.asarray(m[None]), (48, 64)))[0]
    # cv2 uses 5-bit fixed point interpolation -> tolerance ~1/32
    assert np.abs(got - want).max() < 0.04


def test_affine_warp_batched_planes_share_matrix():
    # one matrix warps image + masks + heatmaps identically
    planes = _rand((1, 20, 20, 25))
    m = get_affine_transform((10.0, 10.0), 0.12, 10.0, (20, 20))
    out = np.asarray(affine_warp(jnp.asarray(planes),
                                 jnp.asarray(m[None]), (20, 20)))
    single = np.asarray(affine_warp(jnp.asarray(planes[..., :1]),
                                    jnp.asarray(m[None]), (20, 20)))
    np.testing.assert_allclose(out[..., :1], single, rtol=1e-6, atol=1e-6)


def test_resize_bilinear_np_and_native_match_jax():
    """Host resize implementations (numpy 2-tap and C++ native) equal
    the jax torch-semantics resize on both align_corners modes."""
    import jax.numpy as jnp

    from rtpe_tpu.native import build as build_native, native_bilinear_resize
    from rtpe_tpu.ops.resize import resize_bilinear, resize_bilinear_np

    build_native()
    rng = np.random.RandomState(0)
    for (ih, iw, oh, ow) in [(240, 320, 480, 640), (120, 160, 480, 640),
                             (7, 5, 13, 11), (1, 5, 4, 10), (16, 16, 5, 3)]:
        for ac in (True, False):
            x = rng.rand(ih, iw, 6).astype(np.float32)
            want = np.asarray(resize_bilinear(
                jnp.asarray(x[None]), (oh, ow), align_corners=ac)[0])
            got_np = resize_bilinear_np(x, (oh, ow), align_corners=ac)
            np.testing.assert_allclose(got_np, want, rtol=1e-5, atol=1e-5)
            got_cc = native_bilinear_resize(x, (oh, ow), align_corners=ac)
            if got_cc is not None:
                np.testing.assert_allclose(got_cc, want, rtol=1e-5,
                                           atol=1e-5)
