"""Golden tests: device-side affine warp vs cv2.warpAffine(INTER_LINEAR).

cv2 quantizes bilinear fractions to 5 bits; allow ~2 uint8 levels of
tolerance (SURVEY.md §7 'hard parts').
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hgr_tpu.ops.affine import build_affine
from hgr_tpu.ops.warp import affine_warp, batched_affine_warp

cv2 = pytest.importorskip("cv2")

RNG = np.random.RandomState(42)


def _cv2_warp(img, m, out_wh):
    return cv2.warpAffine(img, np.asarray(m, np.float64), out_wh,
                          flags=cv2.INTER_LINEAR)


@pytest.mark.parametrize("center,scale,rot,osz", [
    ((128.0, 96.0), 1.0, 0.0, 89.6),
    ((128.0, 96.0), 1.2, 30.0, 89.6),
    ((40.0, 40.0), 0.7, -75.0, 120.0),     # crop mostly out of bounds
    ((250.0, 180.0), 1.35, 40.0, 60.0),    # far corner
    ((128.0, 96.0), 1.0, 180.0, 100.0),
])
def test_warp_matches_cv2(center, scale, rot, osz):
    img = RNG.randint(0, 256, (192, 256, 3), np.uint8)
    m = build_affine(jnp.array(center), scale, rot, osz, (192, 192))
    ref = _cv2_warp(img, np.asarray(m), (192, 192))
    got = np.asarray(affine_warp(jnp.asarray(img), m, (192, 192)))
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    # cv2's 5-bit fixed-point bilinear: allow small quantization error on
    # nearly all pixels, and a few larger outliers at tap boundaries.
    assert np.mean(diff) < 0.6, f"mean abs diff {np.mean(diff)}"
    assert np.percentile(diff, 99) <= 4

def test_warp_identity():
    img = RNG.randint(0, 256, (48, 48, 1), np.uint8)
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    got = np.asarray(affine_warp(jnp.asarray(img), m, (48, 48)))
    np.testing.assert_array_equal(got, img)


def test_warp_out_of_bounds_is_zero():
    img = np.full((32, 32, 3), 255, np.uint8)
    # Translate completely off the canvas.
    m = jnp.array([[1.0, 0.0, 1000.0], [0.0, 1.0, 1000.0]])
    got = np.asarray(affine_warp(jnp.asarray(img), m, (32, 32)))
    np.testing.assert_array_equal(got, 0)


def test_batched_warp_matches_loop():
    imgs = RNG.randint(0, 256, (4, 96, 128, 3), np.uint8)
    centers = jnp.asarray(RNG.rand(4, 2) * 100 + 10)
    scales = jnp.asarray(RNG.rand(4) * 0.5 + 0.8)
    rots = jnp.asarray(RNG.rand(4) * 90 - 45)
    ms = build_affine(centers, scales, rots, jnp.full((4,), 44.8), (64, 64))
    batched = np.asarray(
        batched_affine_warp(jnp.asarray(imgs), ms, (64, 64)))
    for i in range(4):
        single = np.asarray(affine_warp(jnp.asarray(imgs[i]), ms[i], (64, 64)))
        np.testing.assert_array_equal(batched[i], single)


def test_warp_float_input_differentiable_range():
    # float path keeps dtype and doesn't round
    img = RNG.rand(32, 32, 3).astype(np.float32)
    m = build_affine(jnp.array([16.0, 16.0]), 1.0, 10.0, 20.0, (32, 32))
    out = np.asarray(affine_warp(jnp.asarray(img), m, (32, 32)))
    assert out.dtype == np.float32
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6


# ---- two-pass (TPU-fast) warp ----

from hgr_tpu.ops.warp import batched_affine_warp_twopass


@pytest.mark.parametrize("center,scale,rot,osz", [
    ((128.0, 128.0), 1.0, 0.0, 89.6),
    ((128.0, 128.0), 1.2, 30.0, 89.6),
    ((100.0, 140.0), 0.8, -75.0, 120.0),
    ((128.0, 128.0), 1.0, 90.0, 100.0),    # transpose path
    ((128.0, 128.0), 1.35, 180.0, 80.0),
])
def test_twopass_close_to_cv2(center, scale, rot, osz):
    img = RNG.randint(0, 256, (256, 256, 3), np.uint8)
    m = build_affine(jnp.array(center), scale, rot, osz, (192, 192))
    ref = _cv2_warp(img, np.asarray(m), (192, 192))
    got = np.asarray(batched_affine_warp_twopass(
        jnp.asarray(img)[None], m[None], (192, 192))[0])
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32)).astype(float)
    # interpolation along the sheared line differs from axis-aligned
    # bilinear at hard edges; random-noise images are the worst case
    assert np.mean(diff) < 12.0, np.mean(diff)


def test_twopass_smooth_image_tight():
    """On smooth (real-photo-like) content, the two-pass result is within
    ~1 intensity level of cv2."""
    yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
    img = np.stack([
        127 + 80 * np.sin(xx / 23) * np.cos(yy / 17),
        127 + 100 * np.cos((xx + yy) / 31),
        255 * (xx + yy) / 512,
    ], -1).clip(0, 255).astype(np.uint8)
    m = build_affine(jnp.array([128.0, 128.0]), 1.1, 27.0, 100.0, (192, 192))
    ref = _cv2_warp(img, np.asarray(m), (192, 192))
    got = np.asarray(batched_affine_warp_twopass(
        jnp.asarray(img)[None], m[None], (192, 192))[0])
    diff = np.abs(got.astype(float) - ref.astype(float))
    assert np.mean(diff) < 1.0, np.mean(diff)
    assert np.percentile(diff, 99) <= 3


def test_twopass_identity_exact():
    img = RNG.randint(0, 256, (64, 64, 3), np.uint8)
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    got = np.asarray(batched_affine_warp_twopass(
        jnp.asarray(img)[None], m[None], (64, 64))[0])
    np.testing.assert_array_equal(got, img)


def test_twopass_out_of_bounds_zero():
    img = np.full((64, 64, 3), 255, np.uint8)
    m = jnp.array([[1.0, 0.0, 1000.0], [0.0, 1.0, 1000.0]])
    got = np.asarray(batched_affine_warp_twopass(
        jnp.asarray(img)[None], m[None], (64, 64))[0])
    np.testing.assert_array_equal(got, 0)
