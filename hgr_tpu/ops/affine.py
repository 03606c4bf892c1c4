"""Affine crop geometry — closed-form, batched, on device.

Replaces the reference's numpy+cv2 implementation
(reference libs/transforms.py:20-60: ``get_affine_transform`` builds a 2x3
matrix from a 3-point correspondence via ``cv2.getAffineTransform``;
``affine_transform`` applies it to points). Here the 3-point solve is done
in closed form with a batched 3x3 ``jnp.linalg.solve`` so thousands of crop
matrices are produced per train step with no host round-trip.

Conventions match the reference exactly:
  * ``center``    — crop center in source-image pixels, (x, y).
  * ``scale``     — isotropic scale factor (scalar) or (sx, sy).
  * ``rot_deg``   — rotation in degrees.
  * ``origin_size`` — side length of the source crop square before scaling.
  * ``output_size`` — (out_w, out_h) of the destination image.
The returned 2x3 matrix ``M`` maps SOURCE pixel coords -> DESTINATION pixel
coords: ``dst = M @ [x, y, 1]``.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array


def _third_point(a: Array, b: Array) -> Array:
    """Perpendicular third point (reference libs/transforms.py:5-7):
    b + rot90(a - b)."""
    direct = a - b
    return b + jnp.stack([-direct[..., 1], direct[..., 0]], axis=-1)


def _rotate_dir(point: Array, rot_rad: Array) -> Array:
    """Rotate a 2-vector by ``rot_rad`` (reference libs/transforms.py:10-17)."""
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    return jnp.stack(
        [point[..., 0] * cs - point[..., 1] * sn,
         point[..., 0] * sn + point[..., 1] * cs],
        axis=-1,
    )


def _solve_affine(src: Array, dst: Array) -> Array:
    """Solve the 2x3 affine mapping 3 src points to 3 dst points.

    Closed-form equivalent of ``cv2.getAffineTransform``
    (reference libs/transforms.py:50-52): with A = [[x_i, y_i, 1]],
    M^T = A^{-1} @ dst, so M = (A^{-1} @ dst)^T, shape (..., 2, 3).
    """
    ones = jnp.ones(src.shape[:-1] + (1,), src.dtype)
    a = jnp.concatenate([src, ones], axis=-1)  # (..., 3, 3)
    m_t = jnp.linalg.solve(a, dst)  # (..., 3, 2)
    return jnp.swapaxes(m_t, -1, -2)  # (..., 2, 3)


def build_affine(
    center: Array,
    scale: Union[Array, float],
    rot_deg: Union[Array, float],
    origin_size: Union[Array, float],
    output_size: Union[Sequence[int], Array],
    shift: Union[Array, Tuple[float, float]] = (0.0, 0.0),
    inv: bool = False,
) -> Array:
    """Build the crop affine (reference libs/transforms.py:20-54), batched.

    All scalar args may carry leading batch dims (broadcast together).
    Returns (..., 2, 3) float32.
    """
    center = jnp.asarray(center, jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)
    rot_deg = jnp.asarray(rot_deg, jnp.float32)
    origin_size = jnp.asarray(origin_size, jnp.float32)
    output_size = jnp.asarray(output_size, jnp.float32)
    shift = jnp.asarray(shift, jnp.float32)

    if scale.ndim == center.ndim - 1:  # scalar scale per batch element
        scale = scale[..., None] * jnp.ones_like(center)
    if origin_size.ndim < center.ndim:
        origin_size = origin_size[..., None] * jnp.ones_like(center)

    scale_tmp = scale * origin_size  # (..., 2)
    src_w = scale_tmp[..., 0]
    dst_w = output_size[..., 0]
    dst_h = output_size[..., 1]

    rot_rad = jnp.pi * rot_deg / 180.0
    src_dir = _rotate_dir(
        jnp.stack([jnp.zeros_like(src_w), src_w * -0.5], axis=-1), rot_rad
    )
    dst_dir = jnp.stack([jnp.zeros_like(dst_w), dst_w * -0.5], axis=-1)

    src0 = center + scale_tmp * shift
    src1 = center + src_dir + scale_tmp * shift
    src2 = _third_point(src0, src1)

    dst_c = jnp.stack([dst_w * 0.5, dst_h * 0.5], axis=-1)
    dst0 = dst_c
    dst1 = dst_c + dst_dir
    dst2 = _third_point(dst0, dst1)

    src = jnp.stack([src0, src1, src2], axis=-2)  # (..., 3, 2)
    dst = jnp.stack([dst0, dst1, dst2], axis=-2)
    dst0b, dst1b = jnp.broadcast_arrays(src, dst)
    if inv:
        return _solve_affine(dst1b, dst0b)
    return _solve_affine(dst0b, dst1b)


def transform_points(points: Array, m: Array) -> Array:
    """Apply 2x3 affine(s) to points (reference libs/transforms.py:57-60).

    points: (..., N, 2); m: (..., 2, 3) -> (..., N, 2).
    """
    points = jnp.asarray(points, jnp.float32)
    # Geometry must be exact: force full-f32 MXU passes (JAX's default
    # matmul precision is reduced on TPU and would shift crops by pixels).
    lin = jnp.einsum(
        "...ij,...nj->...ni",
        m[..., :, :2],
        points,
        precision=jax.lax.Precision.HIGHEST,
    )
    return lin + m[..., None, :, 2]


def invert_affine(m: Array) -> Array:
    """Invert 2x3 affine(s): if dst = A src + b then src = A^-1 dst - A^-1 b."""
    a = m[..., :, :2]  # (..., 2, 2)
    b = m[..., :, 2]  # (..., 2)
    det = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    inv_a = (
        jnp.stack(
            [
                jnp.stack([a[..., 1, 1], -a[..., 0, 1]], axis=-1),
                jnp.stack([-a[..., 1, 0], a[..., 0, 0]], axis=-1),
            ],
            axis=-2,
        )
        / det[..., None, None]
    )
    inv_b = -jnp.einsum("...ij,...j->...i", inv_a, b)
    return jnp.concatenate([inv_a, inv_b[..., None]], axis=-1)


def compose_affine(m2: Array, m1: Array) -> Array:
    """Compose: result(x) = m2(m1(x)). Both (..., 2, 3)."""
    hi = jax.lax.Precision.HIGHEST
    a = jnp.einsum(
        "...ij,...jk->...ik", m2[..., :, :2], m1[..., :, :2], precision=hi
    )
    b = (
        jnp.einsum("...ij,...j->...i", m2[..., :, :2], m1[..., :, 2], precision=hi)
        + m2[..., :, 2]
    )
    return jnp.concatenate([a, b[..., None]], axis=-1)
