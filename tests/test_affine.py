"""Golden tests: affine construction vs the reference formulas (cv2/numpy).

The reference implementation is re-derived locally in numpy (from the
documented semantics of libs/transforms.py) and, when cv2 is available,
checked against cv2.getAffineTransform directly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hgr_tpu.ops.affine import (
    build_affine,
    compose_affine,
    invert_affine,
    transform_points,
)

cv2 = pytest.importorskip("cv2")


def _ref_get_affine_transform(center, scale, rot, origin_size, output_size,
                              shift=np.array([0, 0], dtype=np.float32), inv=0):
    """Numpy re-derivation of reference libs/transforms.py:20-54."""
    if not isinstance(scale, np.ndarray) and not isinstance(scale, list):
        scale = np.array([scale, scale])
    scale_tmp = scale * origin_size
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size[0], output_size[1]

    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_point = [0, src_w * -0.5]
    src_dir = np.array(
        [src_point[0] * cs - src_point[1] * sn,
         src_point[0] * sn + src_point[1] * cs])
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    def third(a, b):
        direct = a - b
        return b + np.array([-direct[1], direct[0]], dtype=np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale_tmp * shift
    src[1, :] = center + src_dir + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2:, :] = third(src[0, :], src[1, :])
    dst[2:, :] = third(dst[0, :], dst[1, :])

    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


CASES = [
    # (center, scale, rot, origin_size, output_size)
    ((100.0, 80.0), 1.0, 0.0, 70.0, (192, 192)),
    ((50.0, 50.0), 1.2, 30.0, 35.0, (192, 192)),
    ((200.0, 150.0), 0.8, -45.0, 120.0, (48, 48)),
    ((10.0, 300.0), 1.35, 17.5, 90.0, (416, 416)),
    ((128.0, 128.0), 1.0, 90.0, 64.0, (192, 96)),
]


@pytest.mark.parametrize("center,scale,rot,osz,out", CASES)
def test_build_affine_matches_reference(center, scale, rot, osz, out):
    ref = _ref_get_affine_transform(np.array(center), scale, rot, osz, out)
    got = np.asarray(build_affine(jnp.array(center), scale, rot, osz, out))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("center,scale,rot,osz,out", CASES[:3])
def test_build_affine_inverse_flag(center, scale, rot, osz, out):
    ref = _ref_get_affine_transform(
        np.array(center), scale, rot, osz, out, inv=1)
    got = np.asarray(
        build_affine(jnp.array(center), scale, rot, osz, out, inv=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_build_affine_batched():
    centers = jnp.array([[100.0, 80.0], [50.0, 60.0], [75.0, 75.0]])
    scales = jnp.array([1.0, 1.1, 0.9])
    rots = jnp.array([0.0, 15.0, -20.0])
    osz = jnp.array([70.0, 35.0, 50.0])
    batched = np.asarray(
        build_affine(centers, scales, rots, osz, (192, 192)))
    for i in range(3):
        single = _ref_get_affine_transform(
            np.asarray(centers[i]), float(scales[i]), float(rots[i]),
            float(osz[i]), (192, 192))
        np.testing.assert_allclose(batched[i], single, rtol=1e-4, atol=1e-3)


def test_transform_points_matches_reference():
    m = build_affine(jnp.array([100.0, 80.0]), 1.2, 25.0, 70.0, (192, 192))
    pts = np.random.RandomState(0).rand(21, 2).astype(np.float32) * 200
    got = np.asarray(transform_points(jnp.asarray(pts), m))
    ref_m = _ref_get_affine_transform(
        np.array([100.0, 80.0]), 1.2, 25.0, 70.0, (192, 192))
    for i in range(21):
        ref_pt = ref_m @ np.array([pts[i, 0], pts[i, 1], 1.0])
        np.testing.assert_allclose(got[i], ref_pt[:2], rtol=1e-4, atol=1e-2)


def test_invert_and_compose():
    m = build_affine(jnp.array([100.0, 80.0]), 1.2, 25.0, 70.0, (192, 192))
    ident = np.asarray(compose_affine(m, invert_affine(m)))
    np.testing.assert_allclose(
        ident, np.array([[1, 0, 0], [0, 1, 0]], np.float32), atol=1e-4)

    # compose == applying sequentially
    m2 = build_affine(jnp.array([96.0, 96.0]), 1.0, -10.0, 100.0, (48, 48))
    pts = jnp.asarray(np.random.RandomState(1).rand(5, 2) * 150)
    seq = transform_points(transform_points(pts, m), m2)
    one = transform_points(pts, compose_affine(m2, m))
    np.testing.assert_allclose(np.asarray(seq), np.asarray(one), atol=1e-3)
