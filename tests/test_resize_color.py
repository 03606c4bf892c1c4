"""Golden tests: align-corners upsample vs torch F.interpolate; half-pixel
resize vs cv2.resize; HSV jitter vs the cv2 LUT reference; posemb vs torch.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hgr_tpu.ops.color import (
    bgr_to_hsv_u8,
    fliplr_image,
    fliplr_joints,
    hsv_jitter,
    hsv_to_bgr_u8,
    normalize_imagenet,
    denormalize_imagenet,
)
from hgr_tpu.ops.posemb import pos_emb_sincos_2d
from hgr_tpu.ops.resize import (
    resize_bilinear,
    upsample_bilinear_align_corners,
)

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")


def test_upsample_align_corners_matches_torch():
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 12, 12, 256).astype(np.float32)  # NHWC
    ref = F.interpolate(
        torch.as_tensor(x.transpose(0, 3, 1, 2)), scale_factor=(4, 4),
        mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_upsample_align_corners_other_sizes():
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(1, 7, 9, 3).astype(np.float32)
    ref = F.interpolate(
        torch.as_tensor(x.transpose(0, 3, 1, 2)), scale_factor=(4, 4),
        mode="bilinear", align_corners=True).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_matches_cv2():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (90, 120, 3), np.uint8).astype(np.float32)
    ref = cv2.resize(img, (64, 48), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(jnp.asarray(img), (48, 64)))
    assert np.mean(np.abs(got - ref)) < 0.5
    assert np.percentile(np.abs(got - ref), 99) < 2.0


# ---- HSV ----

def test_hsv_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (32, 32, 3)).astype(np.float32)
    back = np.asarray(hsv_to_bgr_u8(bgr_to_hsv_u8(jnp.asarray(img))))
    np.testing.assert_allclose(back, img, atol=1.5)


def test_bgr_to_hsv_matches_cv2():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (48, 48, 3), np.uint8)
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.float32)
    got = np.asarray(bgr_to_hsv_u8(jnp.asarray(img.astype(np.float32))))
    got_r = np.round(got)
    # Hue is circular mod 180; saturation/value direct.
    dh = np.abs(got_r[..., 0] - ref[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert np.percentile(dh, 99) <= 1.0
    assert np.percentile(np.abs(got_r[..., 1:] - ref[..., 1:]), 99) <= 1.0


def _ref_color_jitter(img, r):
    """cv2 LUT reference (libs/augmentations.py:22-45) with fixed gains."""
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(np.uint8)
    lut_sat = np.clip(x * r[1], 0, 255).astype(np.uint8)
    lut_val = np.clip(x * r[2], 0, 255).astype(np.uint8)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat),
                        cv2.LUT(val, lut_val)))
    return cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)


@pytest.mark.parametrize("seed", [0, 1])
def test_hsv_jitter_close_to_cv2(seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (64, 64, 3), np.uint8)
    r = rng.uniform(-1, 1, 3) * np.array([0.015, 0.7, 0.4]) + 1
    ref = _ref_color_jitter(img, r).astype(np.float32)
    got = np.asarray(hsv_jitter(jnp.asarray(img.astype(np.float32)),
                                jnp.asarray(r.astype(np.float32))))
    diff = np.abs(got - ref)
    # LUT + two uint8 colorspace conversions quantize heavily; require
    # agreement in distribution, not per-pixel bit-exactness.
    assert np.mean(diff) < 2.5, np.mean(diff)
    assert np.percentile(diff, 95) <= 6


def test_fliplr():
    rng = np.random.RandomState(5)
    img = rng.rand(2, 8, 10, 3)
    joints = jnp.asarray(rng.rand(2, 21, 2) * 10)
    flipped = np.asarray(fliplr_image(jnp.asarray(img)))
    np.testing.assert_allclose(flipped, img[:, :, ::-1, :])
    fj = np.asarray(fliplr_joints(joints, jnp.full((2,), 10.0)))
    np.testing.assert_allclose(fj[..., 0], 10 - np.asarray(joints)[..., 0] - 1,
                               rtol=1e-6)
    np.testing.assert_allclose(fj[..., 1], np.asarray(joints)[..., 1])


def test_normalize_roundtrip():
    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (4, 16, 16, 3)).astype(np.float32)
    norm = normalize_imagenet(jnp.asarray(img))
    back = np.asarray(denormalize_imagenet(norm))
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_normalize_matches_torchvision():
    tv = pytest.importorskip("torchvision.transforms")
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    t = tv.Compose([
        tv.ToTensor(),
        tv.Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
    ])
    ref = t(img).numpy().transpose(1, 2, 0)
    got = np.asarray(normalize_imagenet(jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_pos_emb_matches_torch_reference():
    """Reference model/transformer.py:9-26 re-derived in torch."""
    h, w, dim = 12, 12, 256
    y, x = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    omega = torch.arange(dim // 4, dtype=torch.float32)
    omega = 1.0 / (10000 ** omega)
    yv = y.flatten()[:, None] * omega[None, :]
    xv = x.flatten()[:, None] * omega[None, :]
    ref = torch.cat((xv.sin(), xv.cos(), yv.sin(), yv.cos()), dim=1).numpy()
    got = pos_emb_sincos_2d(h, w, dim)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
