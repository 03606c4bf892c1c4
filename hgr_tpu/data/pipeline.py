"""Device-side augmentation + preprocessing pipeline.

The reference does all of this per-sample on CPU DataLoader workers with
OpenCV (reference libs/load.py:52-146: random scale/rotate/translate/flip/
HSV-jitter -> cv2.warpAffine -> normalize -> Gaussian targets). Here the
whole chain is ONE jitted, batched device function:

  host:   decode JPEG -> stage into a fixed square uint8 canvas
          (``stage_image``; records the orig->canvas affine)
  device: draw augment params with jax PRNG (``draw_augment_params``,
          distributions exactly matching libs/load.py:116-133)
          -> fold flip + crop geometry into ONE affine
          -> HSV jitter -> single bilinear warp -> ImageNet normalize
          -> joint transform -> Gaussian heatmap targets
          (``apply_augment_batch``)

Geometry note: the reference warps the ORIGINAL image directly. We stage
through a canvas, composing crop_affine ∘ canvas_to_orig into one matrix,
so exactly ONE resampling happens when the source fits the canvas (the
common case for HaGRID crops); oversized sources get one extra host
downscale — the canvas only needs the central ~75% of the image because
origin_size = 0.35*max(h,w) bounds the crop extent (libs/load.py:69-70).

The horizontal flip is folded into the warp affine instead of flipping
pixels (flip ∘ crop == crop' where crop' composes the mirror matrix) —
zero extra memory traffic, same output.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hgr_tpu.config import AugmentConfig
from hgr_tpu.ops.affine import build_affine, compose_affine, invert_affine, transform_points
from hgr_tpu.ops.color import hsv_jitter, normalize_imagenet
from hgr_tpu.ops.heatmap import generate_targets
from hgr_tpu.ops.warp import batched_affine_warp, batched_affine_warp_twopass

Array = jax.Array


# ---------------------------------------------------------------------------
# Host staging
# ---------------------------------------------------------------------------

def staging_window_fraction(
    aug: AugmentConfig, crop_size_factor: float = 0.35
) -> float:
    """Fraction of max(h, w) the augmented crop can ever sample from.

    Worst case reach from the image center, as a fraction of max(h, w):
      translate: |clip(N(0, tf), ±2tf)| * max(w, h)      <= 2 * tf
      crop half-extent: origin_size * scale_max * sqrt(2)/2 (45° rotation
        of a square of side crop_size_factor * (1 + sf) * max(h, w))
    Window side = 2 * that reach. Defaults (tf=.02, sf=.35, csf=.35) give
    0.748 — the 0.75 the round-1 code hard-coded; larger user augments now
    widen the window instead of silently sampling staged zeros.
    """
    reach = (2.0 * aug.translate_factor
             + crop_size_factor * (1.0 + aug.scale_factor)
             * float(np.sqrt(2.0)) / 2.0)
    return float(min(1.0, 2.0 * reach))


def stage_image(
    img: np.ndarray, canvas_size: int, window_frac: float = 0.75
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """Stage a decoded (H, W, 3) uint8 image into a square canvas.

    Keeps the central window that the crop geometry can ever touch
    (``window_frac * max(h, w)`` — derive it with
    ``staging_window_fraction``), downscaling only when that window
    exceeds the canvas. Returns (canvas_u8, orig_to_canvas_affine
    (2, 3) float32, (orig_h, orig_w)).
    """
    h, w = img.shape[:2]
    win = int(np.ceil(window_frac * max(h, w)))
    cx, cy = w / 2.0, h / 2.0
    x0 = max(0, int(np.floor(cx - win / 2.0)))
    y0 = max(0, int(np.floor(cy - win / 2.0)))
    x1 = min(w, x0 + win)
    y1 = min(h, y0 + win)
    window = img[y0:y1, x0:x1]
    wh, ww = window.shape[:2]

    scale = 1.0
    if max(wh, ww) > canvas_size:
        scale = canvas_size / max(wh, ww)
        new_w = max(1, int(round(ww * scale)))
        new_h = max(1, int(round(wh * scale)))
        window = _host_resize(window, (new_h, new_w))
        wh, ww = window.shape[:2]

    canvas = np.zeros((canvas_size, canvas_size, 3), np.uint8)
    canvas[:wh, :ww] = window[:, :, :3]
    # orig -> canvas: translate by (-x0, -y0) then scale.
    a = np.array(
        [[scale, 0.0, -x0 * scale], [0.0, scale, -y0 * scale]], np.float32)
    return canvas, a, (h, w)


def _host_resize(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear host resize (cv2 when available, PIL fallback)."""
    try:
        import cv2

        return cv2.resize(img, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image

        return np.asarray(
            Image.fromarray(img).resize((out_hw[1], out_hw[0]),
                                        Image.BILINEAR))


# ---------------------------------------------------------------------------
# Device-side parameter sampling
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AugmentParams:
    """Per-sample stochastic augment draw (all shapes lead with batch B)."""

    scale: Array  # (B,)
    rot: Array  # (B,)
    translate: Array  # (B, 2) additive center shift in pixels
    flip: Array  # (B,) {0., 1.}
    jitter_gains: Array  # (B, 3); 1.0 == no-op
    do_jitter: Array  # (B,) {0., 1.}


def draw_augment_params(
    key: Array,
    batch: int,
    sizes_hw: Array,  # (B, 2) float (h, w) original image sizes
    cfg: AugmentConfig,
) -> AugmentParams:
    """Sample the reference's augment distributions with jax PRNG
    (reference libs/load.py:116-133):

      s  = clip(N(1, sf), 1-sf, 1+sf)
      r  = clip(N(0, rf), -2rf, 2rf)  with prob 0.6, else 0
      dc = [w, h] * clip(N(0, tf), -2tf, 2tf)  with prob 0.5 (per-axis N)
      flip with prob 0.5;   HSV jitter with prob 0.5, gains U(-1,1)*g + 1
    """
    ks = jax.random.split(key, 8)
    sf, rf, tf = cfg.scale_factor, cfg.rotate_factor, cfg.translate_factor

    scale = jnp.clip(
        jax.random.normal(ks[0], (batch,)) * sf + 1.0, 1.0 - sf, 1.0 + sf)

    rot_raw = jnp.clip(
        jax.random.normal(ks[1], (batch,)) * rf, -2.0 * rf, 2.0 * rf)
    rot = jnp.where(jax.random.uniform(ks[2], (batch,)) <= 0.6, rot_raw, 0.0)

    t_raw = jnp.clip(
        jax.random.normal(ks[3], (batch, 2)) * tf, -2.0 * tf, 2.0 * tf)
    do_t = (jax.random.uniform(ks[4], (batch,)) <= 0.5)[:, None]
    # reference: c[0] += w * d0 ; c[1] += h * d1 (libs/load.py:123-126)
    wh = jnp.stack([sizes_hw[:, 1], sizes_hw[:, 0]], axis=-1)
    translate = jnp.where(do_t, t_raw * wh, 0.0)

    flip = jnp.where(
        cfg.horizontal_flip
        & (jax.random.uniform(ks[5], (batch,)) <= 0.5), 1.0, 0.0)

    gains_raw = (
        jax.random.uniform(ks[6], (batch, 3), minval=-1.0, maxval=1.0)
        * jnp.array([cfg.hsv_h, cfg.hsv_s, cfg.hsv_v]) + 1.0)
    do_jitter = jnp.where(
        cfg.color_jittering
        & (jax.random.uniform(ks[7], (batch,)) <= 0.5), 1.0, 0.0)
    jitter_gains = jnp.where(do_jitter[:, None], gains_raw, 1.0)

    return AugmentParams(
        scale=scale, rot=rot, translate=translate, flip=flip,
        jitter_gains=jitter_gains, do_jitter=do_jitter)


def identity_params(batch: int) -> AugmentParams:
    """Eval-time params: s=1, r=0, no translate/flip/jitter
    (the reference applies none of the augments outside 'train',
    libs/load.py:116)."""
    return AugmentParams(
        scale=jnp.ones((batch,)),
        rot=jnp.zeros((batch,)),
        translate=jnp.zeros((batch, 2)),
        flip=jnp.zeros((batch,)),
        jitter_gains=jnp.ones((batch, 3)),
        do_jitter=jnp.zeros((batch,)),
    )


# ---------------------------------------------------------------------------
# Device-side batch transform
# ---------------------------------------------------------------------------

def apply_augment_batch(
    canvas: Array,  # (B, S, S, 3) uint8
    orig_to_canvas: Array,  # (B, 2, 3)
    sizes_hw: Array,  # (B, 2) float (h, w)
    joints: Array,  # (B, J, 2) pixel coords in ORIGINAL image space
    joints_vis: Array,  # (B, J)
    params: AugmentParams,
    image_size: Tuple[int, int] = (192, 192),  # (H, W)
    heatmap_size: Tuple[int, int] = (48, 48),  # (Hw, Hh)
    sigma: float = 2.0,
    crop_size_factor: float = 0.35,
    normalize: bool = True,
    warp_method: str = "auto",
    enable_jitter: bool = True,
) -> Dict[str, Array]:
    """The full reference __getitem__ transform, batched on device
    (reference libs/load.py:52-94 + preprocess :99-146).

    Returns dict(image (B, H, W, 3) f32, target (B, J, Hh, Hw),
    target_weight (B, J), joints (B, J, 2) crop-space, label untouched by
    caller).
    """
    b = canvas.shape[0]
    h = sizes_hw[:, 0]
    w = sizes_hw[:, 1]
    out_h, out_w = image_size

    # Crop center + size (reference libs/load.py:69-70).
    center = jnp.stack([w / 2.0, h / 2.0], axis=-1) + params.translate
    origin_size = jnp.maximum(h, w) * crop_size_factor

    # Fold horizontal flip into geometry:
    # reference flips pixels + joints then sets c_x = w - c_x - 1
    # (libs/load.py:131-133); mirror matrix F: x -> w - 1 - x.
    flip = params.flip  # (B,)
    center_f = jnp.stack(
        [jnp.where(flip > 0, w - center[:, 0] - 1.0, center[:, 0]),
         center[:, 1]], axis=-1)

    m_crop = build_affine(
        center_f, params.scale, params.rot, origin_size,
        (float(out_w), float(out_h)))  # orig(flipped) -> crop

    # Mirror matrix F: x -> w - 1 - x (self-inverse). The reference flips
    # pixels, joints AND center, then warps with m_crop built from the
    # flipped center. Equivalently: m_orig = m_crop ∘ F applied to the
    # UNFLIPPED image/joints (m_crop(F(p)) == trans(p_flipped)).
    f_mat = jnp.zeros((b, 2, 3))
    f_mat = f_mat.at[:, 0, 0].set(jnp.where(flip > 0, -1.0, 1.0))
    f_mat = f_mat.at[:, 0, 2].set(jnp.where(flip > 0, w - 1.0, 0.0))
    f_mat = f_mat.at[:, 1, 1].set(1.0)
    m_orig = compose_affine(m_crop, f_mat)  # orig -> crop (flip folded)

    # Compose with the host staging affine: canvas -> orig -> crop.
    m_canvas = compose_affine(m_orig, invert_affine(orig_to_canvas))

    # HSV jitter (pointwise; commutes with the warp) then ONE warp.
    # 'auto': exact 4-tap gather on CPU (golden-parity); on TPU the
    # Pallas two-pass kernel (ops/warp_pallas.py) with the jitter FUSED
    # into the same VMEM pass — the XLA per-element gather is ~30x
    # slower there (1062ms vs 35ms for 512x256x256) and the standalone
    # jitter costs another ~43ms canvas round-trip.
    if warp_method == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        kernel_ok = canvas.shape[1] == canvas.shape[2]
        warp_method = "pallas" if (on_tpu and kernel_ok) else "exact"
    if warp_method == "pallas":
        from hgr_tpu.ops import warp_pallas
        from hgr_tpu.ops.warp_pallas import warp_twopass_pallas

        # The kernel tiles in 128-lane panels; pad the canvas up to the
        # next multiple of 128 ON DEVICE. This decouples the host canvas
        # size (host->device bytes: a 192 canvas uploads 44% less than
        # 256) from the kernel tiling. The pad is zero-fill beyond the
        # staged window — exactly what a larger staged canvas would hold,
        # so results are identical (cv2 BORDER_CONSTANT zeros).
        s = canvas.shape[1]
        s_pad = ((s + 127) // 128) * 128
        if s_pad != s:
            canvas = jnp.pad(
                canvas, ((0, 0), (0, s_pad - s), (0, s_pad - s), (0, 0)))

        # jitter math is skipped statically when disabled (eval paths);
        # the canvas staging dtype is the measured-best for the toolchain.
        crop = warp_twopass_pallas(
            canvas, m_canvas, (out_h, out_w),
            jitter_gains=(params.jitter_gains if enable_jitter else None),
            do_jitter=params.do_jitter,
            canvas_dtype=warp_pallas.PREFERRED_CANVAS_DTYPE)
        crop = crop.astype(jnp.float32)
    else:
        img = canvas.astype(jnp.float32)
        if enable_jitter:
            jittered = hsv_jitter(img, params.jitter_gains)
            img = jnp.where(
                params.do_jitter[:, None, None, None] > 0, jittered, img)
        if warp_method == "twopass":
            crop = batched_affine_warp_twopass(img, m_canvas,
                                               (out_h, out_w))
        else:
            crop = batched_affine_warp(img, m_canvas, (out_h, out_w))
    # cv2.warpAffine on uint8 rounds; reproduce before normalizing.
    crop = jnp.round(jnp.clip(crop, 0.0, 255.0))
    if normalize:
        crop = normalize_imagenet(crop)

    # Joints: original -> crop space (reference libs/load.py:142-144);
    # m_orig already folds the flip.
    joints_crop = transform_points(joints, m_orig)

    target, target_weight = generate_targets(
        joints_crop, joints_vis, (out_w, out_h), heatmap_size, sigma)

    return {
        "image": crop,
        "target": target,
        "target_weight": target_weight,
        "joints": joints_crop,
    }
