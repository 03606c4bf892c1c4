"""Device-side batched affine warp with cv2.INTER_LINEAR semantics.

Replaces ``cv2.warpAffine(..., flags=cv2.INTER_LINEAR)`` used throughout the
reference hot path (reference libs/load.py:136-140, detect.py:97-101,
extract_data.py:140-144). cv2 computes, for every destination pixel, the
inverse-mapped source coordinate and bilinearly blends the 4 neighbours,
treating out-of-bounds taps as the constant border value (default 0).

We reproduce that in pure XLA: invert the 2x3 matrix once, build the source
coordinate grid, and do a vectorized 4-tap gather + blend. The gather is
flattened to 1-D indices so XLA lowers it to a single dynamic-gather; the
whole op is batched over images AND fused with the surrounding augmentation
arithmetic under jit. No per-sample host OpenCV in the loop.

Accuracy note: cv2 internally quantizes bilinear weights to 5 fractional
bits (INTER_BITS=5) — float bilinear agrees within ~2/255 on uint8 data,
covered by golden tests (tests/test_warp.py).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from hgr_tpu.ops.affine import invert_affine

Array = jax.Array


def affine_warp(
    image: Array,
    m: Array,
    out_size: Tuple[int, int],
    fill: Union[float, Array] = 0.0,
) -> Array:
    """Warp one image (H, W, C) with a src->dst 2x3 affine ``m``.

    ``out_size`` is (out_h, out_w) — static. Returns (out_h, out_w, C) with
    the same dtype promotion rules as jnp (compute in float32).
    """
    return batched_affine_warp(image[None], m[None], out_size, fill)[0]


def batched_affine_warp(
    images: Array,
    m: Array,
    out_size: Tuple[int, int],
    fill: Union[float, Array] = 0.0,
) -> Array:
    """Warp a batch (B, H, W, C) with per-image src->dst affines (B, 2, 3).

    Destination pixel (x, y) samples source coordinate inv(M) @ [x, y, 1]
    (this is what cv2.warpAffine does when WARP_INVERSE_MAP is unset).
    Bilinear blend with BORDER_CONSTANT ``fill`` for out-of-bounds taps.
    """
    out_h, out_w = int(out_size[0]), int(out_size[1])
    b, in_h, in_w, c = images.shape
    orig_dtype = images.dtype
    imgs = images.astype(jnp.float32)

    minv = invert_affine(jnp.asarray(m, jnp.float32))  # (B, 2, 3)

    # Destination grid: (out_h, out_w).
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # each (out_h, out_w)

    # Source coords per batch: (B, out_h, out_w).
    sx = (
        minv[:, 0, 0, None, None] * gx[None]
        + minv[:, 0, 1, None, None] * gy[None]
        + minv[:, 0, 2, None, None]
    )
    sy = (
        minv[:, 1, 0, None, None] * gx[None]
        + minv[:, 1, 1, None, None] * gy[None]
        + minv[:, 1, 2, None, None]
    )

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = imgs.reshape(b, in_h * in_w, c)

    def tap(yi: Array, xi: Array) -> Tuple[Array, Array]:
        valid = (xi >= 0) & (xi < in_w) & (yi >= 0) & (yi < in_h)
        xi_c = jnp.clip(xi, 0, in_w - 1)
        yi_c = jnp.clip(yi, 0, in_h - 1)
        idx = (yi_c * in_w + xi_c).reshape(b, out_h * out_w)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        vals = vals.reshape(b, out_h, out_w, c)
        return vals, valid[..., None].astype(jnp.float32)

    v00, m00 = tap(y0i, x0i)
    v01, m01 = tap(y0i, x0i + 1)
    v10, m10 = tap(y0i + 1, x0i)
    v11, m11 = tap(y0i + 1, x0i + 1)

    fill = jnp.asarray(fill, jnp.float32)
    v00 = v00 * m00 + fill * (1.0 - m00)
    v01 = v01 * m01 + fill * (1.0 - m01)
    v10 = v10 * m10 + fill * (1.0 - m10)
    v11 = v11 * m11 + fill * (1.0 - m11)

    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = top * (1.0 - fy) + bot * fy

    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.round(out)
        out = jnp.clip(out, jnp.iinfo(orig_dtype).min, jnp.iinfo(orig_dtype).max)
    return out.astype(orig_dtype)
