"""Bilinear resizes expressed as separable matmuls (MXU-friendly).

The reference's pose decoder upsamples 12x12 patch features x4 with
``F.interpolate(mode='bilinear', align_corners=True)``
(reference model/transformer.py:148-149). ``jax.image.resize`` only
implements half-pixel (align_corners=False) semantics, so for weight-port
parity we build the align-corners interpolation matrix explicitly and
apply it as two small matmuls: ``out = A_h @ x @ A_w^T``. On TPU this is
ideal: the MXU eats the matmuls and XLA fuses the surrounding ops, vs. a
gather-based resize which would hit the VPU/scatter path.

``resize_bilinear`` (half-pixel) is also provided for letterboxing in the
detection pre-process (reference detect.py:15-45 uses cv2.resize, which is
half-pixel bilinear).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=64)
def _align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix, align_corners=True:
    src = i * (n_in - 1) / (n_out - 1)."""
    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, n_in - 2)
    frac = src - lo
    mat = np.zeros((n_out, n_in), np.float32)
    mat[np.arange(n_out), lo] = (1.0 - frac).astype(np.float32)
    mat[np.arange(n_out), lo + 1] = frac.astype(np.float32)
    return mat


@functools.lru_cache(maxsize=64)
def _half_pixel_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear matrix, half-pixel centers (cv2/jax default):
    src = (i + 0.5) * n_in / n_out - 0.5, edge-clamped."""
    src = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    lo0 = np.clip(lo, 0, n_in - 1)
    lo1 = np.clip(lo + 1, 0, n_in - 1)
    mat = np.zeros((n_out, n_in), np.float32)
    np.add.at(mat, (np.arange(n_out), lo0), (1.0 - frac).astype(np.float32))
    np.add.at(mat, (np.arange(n_out), lo1), frac.astype(np.float32))
    return mat


def _separable_resize(x: Array, out_hw: Tuple[int, int], mat_fn,
                      precision=jax.lax.Precision.HIGHEST,
                      compute_dtype=jnp.float32) -> Array:
    """Apply per-axis interpolation matrices to (..., H, W, C) NHWC input.

    Defaults to exact f32 matmuls (geometry must not drift under JAX's
    reduced default matmul precision); the model's decoder passes its own
    compute dtype/precision so the upsample rides the fast bf16 MXU path.
    """
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    ah = jnp.asarray(mat_fn(h_in, h_out), compute_dtype)  # (h_out, h_in)
    aw = jnp.asarray(mat_fn(w_in, w_out), compute_dtype)  # (w_out, w_in)
    dtype = x.dtype
    y = jnp.einsum("oh,...hwc->...owc", ah, x.astype(compute_dtype),
                   precision=precision)
    y = jnp.einsum("pw,...owc->...opc", aw, y, precision=precision)
    return y.astype(dtype)


def upsample_bilinear_align_corners(x: Array, scale: int = 4,
                                    precision=jax.lax.Precision.HIGHEST,
                                    compute_dtype=jnp.float32) -> Array:
    """x: (..., H, W, C) -> (..., H*scale, W*scale, C), align_corners=True.

    Exact match for torch F.interpolate(scale_factor=scale, mode='bilinear',
    align_corners=True) (reference model/transformer.py:148-149).
    """
    h, w = x.shape[-3], x.shape[-2]
    return _separable_resize(x, (h * scale, w * scale),
                             _align_corners_matrix, precision, compute_dtype)


def resize_bilinear(x: Array, out_hw: Tuple[int, int],
                    precision=jax.lax.Precision.HIGHEST,
                    compute_dtype=jnp.float32) -> Array:
    """Half-pixel bilinear resize of (..., H, W, C) — cv2.resize semantics
    (used in detection letterboxing, reference detect.py:38)."""
    return _separable_resize(x, out_hw, _half_pixel_matrix, precision,
                             compute_dtype)
