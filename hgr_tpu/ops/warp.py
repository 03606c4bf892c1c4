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


def batched_affine_warp_twopass(
    images: Array,
    m: Array,
    out_size: Tuple[int, int],
) -> Array:
    """TPU-fast affine warp via two-pass (Catmull-Smith) resampling.

    The exact 4-tap gather warp above lowers to ~75M tiny row-gathers on
    TPU (~1s for a 512x256x256 batch — measured). This version decomposes
    the affine into a horizontal then a vertical 1-D linear resample, each
    a single-axis ``take_along_axis`` whose index array has the SAME shape
    as the operand — the pattern XLA/Mosaic lowers to the TPU's vectorized
    dynamic-gather (one gather per lane instead of per element).

    Math: with inverse map (sx, sy) = (p x'+q y'+r, s x'+t y'+u),
      pass 1 builds H[k, x'] = lerp_x(img[k, :], alpha x' + beta k + gamma)
        with alpha = p - q s/t, beta = q/t, gamma = r - q u/t
      pass 2 reads out[y', x'] = lerp_y(H[:, x'], s x' + t y' + u).
    Rotations near +-90 deg (|t| -> 0) route through a transposed image
    with swapped matrix rows. Sampling interpolates along the sheared
    column line, which differs from axis-aligned bilinear by <~1 LSB in
    smooth regions and a few LSB at hard edges (golden-tested) — the
    boundary mask is computed from the ORIGINAL affine so out-of-crop
    behavior matches the exact path.

    Requires square inputs (canvas staging guarantees this).
    """
    out_h, out_w = int(out_size[0]), int(out_size[1])
    b, in_h, in_w, c = images.shape
    assert in_h == in_w, "two-pass warp expects square source canvases"
    s_dim = in_h
    orig_dtype = images.dtype
    imgs = images.astype(jnp.float32)

    minv = invert_affine(jnp.asarray(m, jnp.float32))  # (B, 2, 3)
    p_, q_, r_ = minv[:, 0, 0], minv[:, 0, 1], minv[:, 0, 2]
    s_, t_, u_ = minv[:, 1, 0], minv[:, 1, 1], minv[:, 1, 2]

    # Route near-degenerate (|t| small) through the transpose.
    use_t = jnp.abs(t_) < jnp.abs(s_)
    imgs_sel = jnp.where(use_t[:, None, None, None],
                         jnp.swapaxes(imgs, 1, 2), imgs)
    p = jnp.where(use_t, s_, p_)
    q = jnp.where(use_t, t_, q_)
    r = jnp.where(use_t, u_, r_)
    s2 = jnp.where(use_t, p_, s_)
    t2 = jnp.where(use_t, q_, t_)
    u2 = jnp.where(use_t, r_, u_)
    # After the transpose swap, the roles of sx/sy swap: out[y', x'] reads
    # imgT at (sy, sx); relabel so the algorithm below stays identical.
    # (sx', sy') for the transposed problem:
    #   sx_T = s x' + t y' + u  (was sy), sy_T = p x' + q y' + r (was sx)
    # handled by the row swap performed above.

    safe_t = jnp.where(jnp.abs(t2) < 1e-6, 1e-6, t2)
    alpha = p - q * s2 / safe_t
    beta = q / safe_t
    gamma = r - q * u2 / safe_t

    xs = jnp.arange(out_w, dtype=jnp.float32)
    ks = jnp.arange(s_dim, dtype=jnp.float32)

    # ---- pass 1: horizontal resample of every source row ----
    # positions (B, S, out_w): alpha x' + beta k + gamma
    pos_x = (alpha[:, None, None] * xs[None, None, :]
             + beta[:, None, None] * ks[None, :, None]
             + gamma[:, None, None])
    x0 = jnp.floor(pos_x)
    fx = pos_x - x0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, s_dim - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, s_dim - 1)
    # pad out_w up to s_dim so idx.shape == operand.shape (the fast-path
    # gather pattern), per channel folded into batch.
    pad_w = s_dim - out_w
    if pad_w < 0:
        raise ValueError("output wider than canvas not supported")
    x0p = jnp.pad(x0i, ((0, 0), (0, 0), (0, pad_w)))
    x1p = jnp.pad(x1i, ((0, 0), (0, 0), (0, pad_w)))
    fxp = jnp.pad(fx, ((0, 0), (0, 0), (0, pad_w)))

    flat = jnp.moveaxis(imgs_sel, -1, 1).reshape(b * c, s_dim, s_dim)
    x0c = jnp.repeat(x0p, c, axis=0).reshape(b * c, s_dim, s_dim)
    x1c = jnp.repeat(x1p, c, axis=0).reshape(b * c, s_dim, s_dim)
    fxc = jnp.repeat(fxp, c, axis=0).reshape(b * c, s_dim, s_dim)
    h_left = jnp.take_along_axis(flat, x0c, axis=2)
    h_right = jnp.take_along_axis(flat, x1c, axis=2)
    h = h_left * (1.0 - fxc) + h_right * fxc  # (B*C, S, S)

    # ---- pass 2: vertical resample per output column ----
    ys = jnp.arange(out_h, dtype=jnp.float32)
    pos_y = (s2[:, None, None] * xs[None, None, :]
             + t2[:, None, None] * ys[None, :, None]
             + u2[:, None, None])  # (B, out_h, out_w)
    y0 = jnp.floor(pos_y)
    fy = pos_y - y0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, s_dim - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, s_dim - 1)
    pad_h = s_dim - out_h
    if pad_h < 0:
        raise ValueError("output taller than canvas not supported")
    y0p = jnp.pad(y0i, ((0, 0), (0, pad_h), (0, pad_w)))
    y1p = jnp.pad(y1i, ((0, 0), (0, pad_h), (0, pad_w)))
    fyp = jnp.pad(fy, ((0, 0), (0, pad_h), (0, pad_w)))
    y0c = jnp.repeat(y0p, c, axis=0).reshape(b * c, s_dim, s_dim)
    y1c = jnp.repeat(y1p, c, axis=0).reshape(b * c, s_dim, s_dim)
    fyc = jnp.repeat(fyp, c, axis=0).reshape(b * c, s_dim, s_dim)
    top = jnp.take_along_axis(h, y0c, axis=1)
    bot = jnp.take_along_axis(h, y1c, axis=1)
    out_full = top * (1.0 - fyc) + bot * fyc  # (B*C, S, S)

    out = out_full[:, :out_h, :out_w].reshape(b, c, out_h, out_w)
    out = jnp.moveaxis(out, 1, -1)  # (B, out_h, out_w, C)

    # Boundary mask from the ORIGINAL affine (cv2 BORDER_CONSTANT 0):
    # fully-outside pixels -> 0; partial taps approximate the exact
    # path's per-tap blending with a hard validity test per tap pair.
    gx, gy = jnp.meshgrid(xs, jnp.arange(out_h, dtype=jnp.float32))
    sx = (minv[:, 0, 0, None, None] * gx[None]
          + minv[:, 0, 1, None, None] * gy[None]
          + minv[:, 0, 2, None, None])
    sy = (minv[:, 1, 0, None, None] * gx[None]
          + minv[:, 1, 1, None, None] * gy[None]
          + minv[:, 1, 2, None, None])
    inside = ((sx > -1.0) & (sx < in_w) & (sy > -1.0) & (sy < in_h))
    out = out * inside[..., None].astype(jnp.float32)

    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.round(out)
        out = jnp.clip(out, jnp.iinfo(orig_dtype).min,
                       jnp.iinfo(orig_dtype).max)
    return out.astype(orig_dtype)
