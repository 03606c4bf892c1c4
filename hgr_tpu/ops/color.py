"""Device-side color ops: HSV jitter, flip, normalization.

Replaces the reference's host OpenCV color path:
  * ``hsv_jitter`` — HSV color-space augmentation with per-channel gains
    (reference libs/augmentations.py:22-45: cv2 BGR->HSV, uint8 LUTs with
    gains h/s/v, HSV->BGR). We implement cv2's 8-bit HSV conventions
    (H in [0, 180), S/V in [0, 255]) in float on device and reproduce the
    LUT's truncation with floor, batched over images.
  * ``fliplr_image`` / ``fliplr_joints`` — horizontal flip
    (reference libs/augmentations.py:5-19).
  * ``normalize_imagenet`` — /255 then ImageNet mean/std, applied to the
    channel order as stored (the reference normalizes BGR pixels with
    RGB-ordered stats — libs/load.py:46-50 after BGR imread at :54; we
    preserve that behavior for parity).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from hgr_tpu.config import IMAGENET_MEAN, IMAGENET_STD

Array = jax.Array


def bgr_to_hsv_u8(img: Array) -> Array:
    """cv2-convention BGR->HSV for 8-bit-range float images (..., H, W, 3).

    Input values in [0, 255]; output H in [0, 180), S/V in [0, 255]
    (float, unrounded — cv2 rounds to uint8; callers quantize as needed).
    """
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    # Sector selection — matches cv2's 8-bit formula (H in half-degrees).
    h_r = 30.0 * (g - b) / safe_c
    h_g = 60.0 + 30.0 * (b - r) / safe_c
    h_b = 120.0 + 30.0 * (r - g) / safe_c
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(c > 0, h, 0.0)
    h = jnp.where(h < 0, h + 180.0, h)
    s = jnp.where(v > 0, 255.0 * c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_bgr_u8(hsv: Array) -> Array:
    """cv2-convention HSV->BGR for 8-bit-range float images."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h_deg = h * 2.0  # [0, 360)
    s01 = s / 255.0
    c = v * s01
    hp = h_deg / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c
    sector = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [c, x, jnp.zeros_like(c), jnp.zeros_like(c), x],
        c,
    )
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [x, c, c, x, jnp.zeros_like(c)],
        jnp.zeros_like(c),
    )
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [jnp.zeros_like(c), jnp.zeros_like(c), x, c, c],
        x,
    )
    return jnp.stack([b + m, g + m, r + m], axis=-1)


def hsv_jitter(img: Array, gains: Array) -> Array:
    """HSV augmentation (reference libs/augmentations.py:22-45), batched.

    Args:
      img: (..., H, W, 3) BGR, float in [0, 255].
      gains: (..., 3) multiplicative gains (r_h, r_s, r_v) — the reference
        draws them as U(-1, 1) * [hgain, sgain, vgain] + 1.
    Returns jittered BGR float image in [0, 255].

    The reference applies uint8 LUTs: hue -> floor((x * r_h) % 180),
    sat/val -> floor(clip(x * r, 0, 255)); we floor likewise so device
    output matches the LUT quantization.
    """
    hsv = bgr_to_hsv_u8(img)
    # cv2 stores H/S/V as rounded uint8 before the LUT is applied.
    hsv = jnp.round(hsv)
    gh = gains[..., 0, None, None]
    gs = gains[..., 1, None, None]
    gv = gains[..., 2, None, None]
    h = jnp.floor(jnp.mod(hsv[..., 0] * gh, 180.0))
    s = jnp.floor(jnp.clip(hsv[..., 1] * gs, 0.0, 255.0))
    v = jnp.floor(jnp.clip(hsv[..., 2] * gv, 0.0, 255.0))
    out = hsv_to_bgr_u8(jnp.stack([h, s, v], axis=-1))
    return jnp.round(jnp.clip(out, 0.0, 255.0))


def fliplr_image(img: Array) -> Array:
    """Horizontal flip of (..., H, W, C) images."""
    return img[..., :, ::-1, :]


def fliplr_joints(joints: Array, width: Array) -> Array:
    """Flip joint x coords: x -> width - x - 1 (reference
    libs/augmentations.py:17-18). joints (..., J, 2)."""
    width = jnp.asarray(width, jnp.float32)
    x = width[..., None] - joints[..., 0] - 1.0
    return jnp.stack([x, joints[..., 1]], axis=-1)


def normalize_imagenet(
    img: Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> Array:
    """uint8-range (..., H, W, 3) -> normalized float32
    (reference libs/load.py:46-50: ToTensor /255 then Normalize)."""
    img = jnp.asarray(img, jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img - mean) / std


def denormalize_imagenet(
    img: Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> Array:
    """Inverse of normalize_imagenet, returning [0, 255] float."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (jnp.asarray(img, jnp.float32) * std + mean) * 255.0
