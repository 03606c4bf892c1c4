"""Golden tests for the device-side augmentation pipeline vs a cv2/numpy
re-derivation of the reference preprocess (libs/load.py:52-146) with
injected deterministic parameters.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.config import AugmentConfig
from hgr_tpu.data.pipeline import (
    AugmentParams,
    apply_augment_batch,
    draw_augment_params,
    identity_params,
    stage_image,
)
from hgr_tpu.data.synthetic import make_hand_image

cv2 = pytest.importorskip("cv2")


def _ref_preprocess(img, joints, c, s, r, origin_size, image_size=(192, 192),
                    flip=False):
    """Reference libs/load.py:131-144 with given (already-drawn) params."""
    from tests.test_affine import _ref_get_affine_transform

    joints = joints.copy()
    c = np.asarray(c, np.float64).copy()
    if flip:
        img = img[:, ::-1, :].copy()
        joints[:, 0] = img.shape[1] - joints[:, 0] - 1
        c[0] = img.shape[1] - c[0] - 1
    trans = _ref_get_affine_transform(c, s, r, origin_size, image_size)
    warped = cv2.warpAffine(img, trans,
                            (int(image_size[0]), int(image_size[1])),
                            flags=cv2.INTER_LINEAR)
    out_joints = np.zeros_like(joints)
    for i in range(joints.shape[0]):
        pt = trans @ np.array([joints[i, 0], joints[i, 1], 1.0])
        out_joints[i] = pt[:2]
    return warped, out_joints


def _device_batch(img, joints, params, canvas_size=256, normalize=False):
    canvas, a, (h, w) = stage_image(img, canvas_size)
    out = apply_augment_batch(
        jnp.asarray(canvas)[None],
        jnp.asarray(a)[None],
        jnp.asarray([[h, w]], jnp.float32),
        jnp.asarray(joints)[None],
        jnp.ones((1, joints.shape[0])),
        params,
        normalize=normalize,
    )
    return out


@pytest.mark.parametrize("scale,rot,flip", [
    (1.0, 0.0, False),
    (1.2, 25.0, False),
    (0.8, -40.0, True),
    (1.35, 0.0, True),
])
def test_pipeline_matches_reference_geometry(scale, rot, flip):
    rng = np.random.RandomState(0)
    img, joints = make_hand_image(rng, 224)
    h, w = img.shape[:2]
    c = np.array([w / 2, h / 2])
    origin_size = max(h, w) * 0.35

    ref_img, ref_joints = _ref_preprocess(
        img, joints.astype(np.float64), c, scale, rot, origin_size, flip=flip)

    params = AugmentParams(
        scale=jnp.array([scale]),
        rot=jnp.array([rot]),
        translate=jnp.zeros((1, 2)),
        flip=jnp.array([1.0 if flip else 0.0]),
        jitter_gains=jnp.ones((1, 3)),
        do_jitter=jnp.zeros((1,)),
    )
    out = _device_batch(img, joints, params)

    got_img = np.asarray(out["image"][0])
    diff = np.abs(got_img.astype(np.float32) - ref_img.astype(np.float32))
    assert np.mean(diff) < 0.7, np.mean(diff)
    assert np.percentile(diff, 99) <= 5

    np.testing.assert_allclose(
        np.asarray(out["joints"][0]), ref_joints, atol=5e-2)


def test_pipeline_translate():
    rng = np.random.RandomState(1)
    img, joints = make_hand_image(rng, 200)
    h, w = img.shape[:2]
    dc = np.array([6.0, -4.0])
    c = np.array([w / 2, h / 2]) + dc
    ref_img, ref_joints = _ref_preprocess(
        img, joints.astype(np.float64), c, 1.0, 10.0, max(h, w) * 0.35)

    params = AugmentParams(
        scale=jnp.ones((1,)),
        rot=jnp.array([10.0]),
        translate=jnp.asarray(dc)[None],
        flip=jnp.zeros((1,)),
        jitter_gains=jnp.ones((1, 3)),
        do_jitter=jnp.zeros((1,)),
    )
    out = _device_batch(img, joints, params)
    diff = np.abs(np.asarray(out["image"][0], np.float32)
                  - ref_img.astype(np.float32))
    assert np.mean(diff) < 0.7
    np.testing.assert_allclose(np.asarray(out["joints"][0]), ref_joints,
                               atol=5e-2)


def test_pipeline_oversized_image_staging():
    """Images larger than the canvas downscale through staging but keep
    the crop geometry (joints land in the right place)."""
    rng = np.random.RandomState(2)
    img, joints = make_hand_image(rng, 480)
    params = identity_params(1)
    out = _device_batch(img, joints, params, canvas_size=256)
    ref_img, ref_joints = _ref_preprocess(
        img, joints.astype(np.float64), np.array([240.0, 240.0]),
        1.0, 0.0, 480 * 0.35)
    # joints: exact geometry
    np.testing.assert_allclose(np.asarray(out["joints"][0]), ref_joints,
                               atol=1e-1)
    # pixels: one extra bilinear resample -> looser tolerance
    diff = np.abs(np.asarray(out["image"][0], np.float32)
                  - ref_img.astype(np.float32))
    assert np.mean(diff) < 8.0, np.mean(diff)


def test_pipeline_targets_and_normalization():
    rng = np.random.RandomState(3)
    img, joints = make_hand_image(rng, 224)
    out = _device_batch(img, joints, identity_params(1), normalize=True)
    assert out["image"].shape == (1, 192, 192, 3)
    assert out["target"].shape == (1, 21, 48, 48)
    assert out["target_weight"].shape == (1, 21)
    # Normalized image range sane
    x = np.asarray(out["image"])
    assert x.min() > -3.0 and x.max() < 3.0
    # Gaussians are unnormalized (peak 1); joints whose peak pixel falls
    # inside the map hit exactly 1, edge-clipped ones stay below.
    w = np.asarray(out["target_weight"][0])
    t = np.asarray(out["target"][0])
    j_crop = np.asarray(out["joints"][0])
    assert t.max() <= 1.0 + 1e-6
    interior = [
        j for j in range(21)
        if w[j] > 0 and 8 <= j_crop[j, 0] / 4 <= 40 and 8 <= j_crop[j, 1] / 4 <= 40
    ]
    assert interior, "fixture should place some joints well inside the crop"
    for j in interior:
        assert abs(t[j].max() - 1.0) < 1e-5


def test_draw_params_distributions():
    cfg = AugmentConfig()
    key = jax.random.PRNGKey(0)
    sizes = jnp.full((2048, 2), 224.0)
    p = draw_augment_params(key, 2048, sizes, cfg)
    s = np.asarray(p.scale)
    assert s.min() >= 1 - cfg.scale_factor - 1e-6
    assert s.max() <= 1 + cfg.scale_factor + 1e-6
    assert abs(s.mean() - 1.0) < 0.05
    r = np.asarray(p.rot)
    assert np.abs(r).max() <= 2 * cfg.rotate_factor + 1e-5
    frac_rot = (r != 0).mean()
    assert 0.5 < frac_rot < 0.7  # p=0.6 minus the tiny P(N=0)
    f = np.asarray(p.flip)
    assert 0.4 < f.mean() < 0.6
    t = np.asarray(p.translate)
    assert np.abs(t).max() <= 2 * cfg.translate_factor * 224 + 1e-4
    frac_t = (np.abs(t).sum(-1) > 0).mean()
    assert 0.4 < frac_t < 0.6
    g = np.asarray(p.jitter_gains)
    assert ((g == 1.0).all(axis=-1).mean() > 0.4)  # ~half untouched
    assert g[:, 1].min() >= 1 - cfg.hsv_s - 1e-6


def test_identity_params_noop_geometry():
    rng = np.random.RandomState(4)
    img, joints = make_hand_image(rng, 128)
    out = _device_batch(img, joints, identity_params(1))
    ref_img, ref_joints = _ref_preprocess(
        img, joints.astype(np.float64), np.array([64.0, 64.0]), 1.0, 0.0,
        128 * 0.35)
    diff = np.abs(np.asarray(out["image"][0], np.float32)
                  - ref_img.astype(np.float32))
    assert np.mean(diff) < 0.7
    np.testing.assert_allclose(np.asarray(out["joints"][0]), ref_joints,
                               atol=5e-2)
