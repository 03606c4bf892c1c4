"""Gaussian heatmap target generation + argmax decode — batched, on device.

``generate_targets`` replaces the per-joint Python loop in the reference
(reference libs/load.py:148-206) with a single vectorized render over
(B, J, Hh, Hw): an unnormalized Gaussian (peak 1.0) of std ``sigma`` is
written inside a (6*sigma+1)^2 box around the quantized joint location;
joints whose box misses the heatmap entirely get target_weight 0.

``get_max_preds`` replaces the numpy decode (reference libs/utils.py:4-32):
flat argmax -> (x, y), zeroed where the max is <= 0.

Exact semantic notes (verified by golden tests vs the reference formulas):
  * mu = int(joint / feat_stride + 0.5) — Python int() TRUNCATES toward
    zero, which differs from floor for negative coords; we use jnp.trunc.
  * The Gaussian is evaluated on the integer grid relative to mu and only
    inside the box [mu-3s, mu+3s]; outside it is exactly 0.
  * Visibility weight survives only when the peak box overlaps the map
    (reference libs/load.py:176-181).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def generate_targets(
    joints: Array,
    joints_vis: Array,
    image_size: Sequence[int],
    heatmap_size: Sequence[int],
    sigma: float,
) -> Tuple[Array, Array]:
    """Render Gaussian targets.

    Args:
      joints: (..., J, 2) pixel coords in image space (x, y).
      joints_vis: (..., J) visibility {0, 1}.
      image_size: (W, H) of the input image (reference passes [192, 192]).
      heatmap_size: (Hw, Hh) = image_size // 4.
      sigma: Gaussian std in heatmap pixels (reference default 2).

    Returns:
      target: (..., J, Hh, Hw) float32, target_weight: (..., J) float32.
    """
    joints = jnp.asarray(joints, jnp.float32)
    joints_vis = jnp.asarray(joints_vis, jnp.float32)
    img_w, img_h = float(image_size[0]), float(image_size[1])
    hm_w, hm_h = int(heatmap_size[0]), int(heatmap_size[1])
    stride_x = img_w / hm_w
    stride_y = img_h / hm_h
    tmp_size = sigma * 3.0

    # int() truncation semantics (reference libs/load.py:171-172).
    mu_x = jnp.trunc(joints[..., 0] / stride_x + 0.5)
    mu_y = jnp.trunc(joints[..., 1] / stride_y + 0.5)

    # Box bounds (reference libs/load.py:174-175).
    ul_x = jnp.trunc(mu_x - tmp_size)
    ul_y = jnp.trunc(mu_y - tmp_size)
    br_x = jnp.trunc(mu_x + tmp_size + 1.0)
    br_y = jnp.trunc(mu_y + tmp_size + 1.0)

    oob = (ul_x >= hm_w) | (ul_y >= hm_h) | (br_x < 0) | (br_y < 0)
    weight = jnp.where(oob, 0.0, joints_vis)

    xs = jnp.arange(hm_w, dtype=jnp.float32)
    ys = jnp.arange(hm_h, dtype=jnp.float32)
    dx = xs - mu_x[..., None]  # (..., J, Hw)
    dy = ys - mu_y[..., None]  # (..., J, Hh)
    g = jnp.exp(
        -(dy[..., :, None] ** 2 + dx[..., None, :] ** 2) / (2.0 * sigma**2)
    )  # (..., J, Hh, Hw)

    in_box = (
        (xs >= ul_x[..., None])
        & (xs < br_x[..., None])
    )[..., None, :] & (
        (ys >= ul_y[..., None])
        & (ys < br_y[..., None])
    )[..., :, None]

    target = jnp.where(
        (weight > 0.5)[..., None, None] & in_box, g, 0.0
    )
    return target.astype(jnp.float32), weight.astype(jnp.float32)


def get_max_preds(batch_heatmaps: Array) -> Tuple[Array, Array]:
    """Decode peak (x, y) per joint (reference libs/utils.py:4-32).

    Args:
      batch_heatmaps: (..., J, H, W).
    Returns:
      preds: (..., J, 2) float32 — (x, y), zeroed where peak <= 0.
      maxvals: (..., J, 1) float32.
    """
    hm = jnp.asarray(batch_heatmaps, jnp.float32)
    h, w = hm.shape[-2], hm.shape[-1]
    flat = hm.reshape(hm.shape[:-2] + (h * w,))
    idx = jnp.argmax(flat, axis=-1)
    maxvals = jnp.max(flat, axis=-1)
    px = (idx % w).astype(jnp.float32)
    py = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([px, py], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)[..., None]
    return preds * mask, maxvals[..., None]
