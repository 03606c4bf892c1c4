"""Pallas two-pass affine warp kernel.

Why this exists: the exact 4-tap gather warp (ops/warp.py) lowers to
per-element HBM gathers on TPU (~1s for a 512x256x256 batch, measured),
and XLA's lowering of the two-pass take_along_axis formulation is no
better. Mosaic's `tpu.dynamic_gather` — reachable from a kernel via
``jnp.take_along_axis`` on 2D VMEM values — is a vectorized register
gather, but only for operands with EXACTLY 128 lanes (lane gather) or 8
sublanes (sublane gather), empirically bisected on this toolchain.

Kernel layout per (image, channel) program:
  * the whole canvas channel (S x S, S multiple of 128) lives in VMEM;
  * pass 1 (horizontal): positions u = alpha*x' + beta*k + gamma; the
    canvas splits into S/128-lane panels, each tap gathered per panel and
    combined with selects (chunked over 128-lane output columns);
  * pass 2 (vertical): the intermediate transposes in VMEM, then the same
    chunked lane-gather implements the row resample; transpose back;
  * out-of-crop masking from the original inverse affine, matching
    cv2 BORDER_CONSTANT zero fill.

The affine decomposition (Catmull-Smith shears, transpose routing for
near-90-degree rotations) and parity notes live in
ops/warp.py:batched_affine_warp_twopass — this kernel computes the same
function (tests pin kernel == XLA twopass on CPU interpret mode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

from hgr_tpu.ops.affine import invert_affine
from hgr_tpu.ops.partitioning import batch_partitioned, multi_device

Array = jax.Array
LANE = 128

# Largest per-pallas_call batch: SMEM (1 MB) holds the scalar-prefetched
# (B, 10) params plus Mosaic grid bookkeeping; B=2048 overflowed it by
# 144 bytes on this toolchain, B=1024 fits. Larger batches are chunked.
_MAX_GRID_B = 1024

# Canvas HBM staging dtype the input pipeline uses (see
# warp_twopass_pallas(canvas_dtype=...)); set from TPU measurements —
# bench_suite config 7 compares the variants.
PREFERRED_CANVAS_DTYPE = "float32"


def _chunked_lane_gather(panels, idx):
    """Gather along the last axis of a (S, S) value stored as a list of
    (S, 128) panels: out[r, j] = value[r, idx[r, j]].

    idx: (S, 128) int32 (one output chunk). Uses one tpu.dynamic_gather
    per source panel + selects (the only gather shape Mosaic accepts).
    """
    out = None
    for p, panel in enumerate(panels):
        local = jnp.clip(idx - p * LANE, 0, LANE - 1)
        vals = jnp.take_along_axis(panel, local, axis=1)
        if out is None:
            out = vals
        else:
            out = jnp.where((idx >= p * LANE) & (idx < (p + 1) * LANE),
                            vals, out)
    return out


def _hsv_jitter_planes(b, g, r, gh, gs, gv):
    """HSV LUT jitter on three (S, S) channel planes (cv2 8-bit
    conventions; mirrors ops/color.py:hsv_jitter for in-kernel fusion)."""
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h_r = 30.0 * (g - b) / safe_c
    h_g = 60.0 + 30.0 * (b - r) / safe_c
    h_b = 120.0 + 30.0 * (r - g) / safe_c
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(c > 0, h, 0.0)
    h = jnp.where(h < 0, h + 180.0, h)
    s = jnp.where(v > 0, 255.0 * c / jnp.where(v > 0, v, 1.0), 0.0)

    # uint8 LUT semantics: round the stored HSV, scale, floor.
    h = jnp.floor(jnp.mod(jnp.round(h) * gh, 180.0))
    s = jnp.floor(jnp.clip(jnp.round(s) * gs, 0.0, 255.0))
    v = jnp.floor(jnp.clip(jnp.round(v) * gv, 0.0, 255.0))

    h_deg = h * 2.0
    s01 = s / 255.0
    cc = v * s01
    hp = h_deg / 60.0
    x = cc * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - cc
    sector = jnp.floor(hp).astype(jnp.int32) % 6
    zero = jnp.zeros_like(cc)

    def pick(v0, v1, v2, v3, v4, v5):
        # nested selects (jnp.select lowers to an argmax Mosaic lacks)
        return jnp.where(
            sector == 0, v0, jnp.where(
                sector == 1, v1, jnp.where(
                    sector == 2, v2, jnp.where(
                        sector == 3, v3, jnp.where(
                            sector == 4, v4, v5)))))

    r2 = pick(cc, x, zero, zero, x, cc)
    g2 = pick(x, cc, cc, x, zero, zero)
    b2 = pick(zero, zero, x, cc, cc, x)
    clip255 = lambda t: jnp.round(jnp.clip(t, 0.0, 255.0))
    return clip255(b2 + m), clip255(g2 + m), clip255(r2 + m)


def _warp_kernel(params_ref, img_ref, out_ref, *, s_dim: int,
                 with_jitter: bool):
    """One image: img_ref (1, 3, S, S) -> out_ref (1, 3, S, S).

    ``params_ref`` is the whole (B, 10) array scalar-prefetched into SMEM
    (PrefetchScalarGridSpec); rows indexed by the image grid axis.
    Columns: alpha beta gamma s2 t2 u2 gh gs gv do_jitter."""
    i = pl.program_id(0)
    alpha = params_ref[i, 0]
    beta = params_ref[i, 1]
    gamma = params_ref[i, 2]
    s2 = params_ref[i, 3]
    t2 = params_ref[i, 4]
    u2 = params_ref[i, 5]

    # canvas may arrive as uint8 (4x less HBM traffic); compute in f32
    bch = img_ref[0, 0].astype(jnp.float32)
    gch = img_ref[0, 1].astype(jnp.float32)
    rch = img_ref[0, 2].astype(jnp.float32)
    if with_jitter:
        jb, jg, jr = _hsv_jitter_planes(
            bch, gch, rch, params_ref[i, 6], params_ref[i, 7],
            params_ref[i, 8])
        do_j = params_ref[i, 9] > 0.0
        bch = jnp.where(do_j, jb, bch)
        gch = jnp.where(do_j, jg, gch)
        rch = jnp.where(do_j, jr, rch)

    for ch_idx, img in enumerate((bch, gch, rch)):
        _warp_one_channel(img, out_ref, ch_idx, alpha, beta, gamma, s2, t2,
                          u2, s_dim)


def _warp_one_channel(img, out_ref, ch_idx, alpha, beta, gamma, s2, t2, u2,
                      s_dim):
    n_panels = s_dim // LANE
    src_panels = [img[:, p * LANE:(p + 1) * LANE] for p in range(n_panels)]

    # ---- pass 1: horizontal resample, chunk over output columns ----
    k_col = jax.lax.broadcasted_iota(jnp.int32, (s_dim, LANE), 0).astype(jnp.float32)
    h_chunks = []
    for c in range(n_panels):
        xprime = (jax.lax.broadcasted_iota(jnp.int32, (s_dim, LANE), 1)
                  .astype(jnp.float32) + c * LANE)
        pos = alpha * xprime + beta * k_col + gamma
        x0 = jnp.floor(pos)
        fx = pos - x0
        x0i = jnp.clip(x0.astype(jnp.int32), 0, s_dim - 1)
        x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, s_dim - 1)
        left = _chunked_lane_gather(src_panels, x0i)
        right = _chunked_lane_gather(src_panels, x1i)
        h_chunks.append(left * (1.0 - fx) + right * fx)
    h = jnp.concatenate(h_chunks, axis=1)  # (S, S): H[k, x']

    # ---- pass 2: vertical resample via transpose + lane gather ----
    ht = h.T  # (S, S): Ht[x', k]
    ht_panels = [ht[:, p * LANE:(p + 1) * LANE] for p in range(n_panels)]
    xprime_col = jax.lax.broadcasted_iota(jnp.int32, (s_dim, LANE), 0).astype(jnp.float32)
    out_chunks = []
    for c in range(n_panels):
        yprime = (jax.lax.broadcasted_iota(jnp.int32, (s_dim, LANE), 1)
                  .astype(jnp.float32) + c * LANE)
        pos = s2 * xprime_col + t2 * yprime + u2
        y0 = jnp.floor(pos)
        fy = pos - y0
        y0i = jnp.clip(y0.astype(jnp.int32), 0, s_dim - 1)
        y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, s_dim - 1)
        top = _chunked_lane_gather(ht_panels, y0i)
        bot = _chunked_lane_gather(ht_panels, y1i)
        out_chunks.append(top * (1.0 - fy) + bot * fy)
    out_t = jnp.concatenate(out_chunks, axis=1)  # (S, S): out[x', y']
    out_ref[0, ch_idx] = out_t.T


def _warp_one_call(params_c: Array, chw_c: Array, *, with_jitter: bool,
                   interpret: bool) -> Array:
    """One pallas_call over a ≤_MAX_GRID_B batch chunk."""
    nb, c, s_dim, _ = chw_c.shape
    kernel = functools.partial(_warp_kernel, s_dim=s_dim,
                               with_jitter=with_jitter)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 3, s_dim, s_dim),
                         lambda i, params: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, s_dim, s_dim),
                               lambda i, params: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, c, s_dim, s_dim), jnp.float32),
        interpret=interpret,
    )(params_c, chw_c)


def _warp_chunk_impl(params_c: Array, chw_c: Array, *, with_jitter: bool,
                     interpret: bool) -> Array:
    """Warp any batch size, splitting into ≤_MAX_GRID_B pallas_calls.

    Scalar-prefetch SMEM + grid bookkeeping overflow the 1 MB SMEM just
    past B=1024 on this toolchain (measured: B=2048 exceeds it by 144
    bytes). The chunking lives HERE — inside the unit the partitioner
    lowers per shard — because the SMEM cap is per device: a global
    B=8192 over 8 devices is a single fine call per device, not eight
    sliced ones."""
    b = chw_c.shape[0]
    if b <= _MAX_GRID_B:
        return _warp_one_call(params_c, chw_c, with_jitter=with_jitter,
                              interpret=interpret)
    return jnp.concatenate(
        [_warp_one_call(params_c[s:s + _MAX_GRID_B],
                        chw_c[s:s + _MAX_GRID_B],
                        with_jitter=with_jitter, interpret=interpret)
         for s in range(0, b, _MAX_GRID_B)], axis=0)


@functools.lru_cache(maxsize=16)
def _sharded_warp_chunk(with_jitter: bool, interpret: bool):
    """Batch-partitioned warp launcher (one cached op per config)."""
    return batch_partitioned(
        lambda params_c, chw_c: _warp_chunk_impl(
            params_c, chw_c, with_jitter=with_jitter, interpret=interpret),
        sharding_rule="b p, b c s t -> b c s t")


def warp_twopass_pallas(
    images: Array,  # (B, S, S, 3) float32 BGR
    m: Array,  # (B, 2, 3) src->dst affine
    out_size: Tuple[int, int],
    interpret: bool = False,
    jitter_gains: Array = None,  # (B, 3) HSV gains, fused when given
    do_jitter: Array = None,  # (B,) {0., 1.}
    canvas_dtype: str = "float32",  # 'float32' | 'bfloat16' | 'uint8'
) -> Array:
    """Pallas-accelerated two-pass warp, optionally fusing the HSV jitter
    (reference libs/augmentations.py:22-45) into the same VMEM pass —
    the standalone device jitter costs another full canvas HBM round
    trip (~43 ms at 512x256x256). Same contract as
    ops.warp.batched_affine_warp_twopass (square canvas, S % 128 == 0,
    3 channels).

    ``canvas_dtype`` picks the dtype the canvas is STAGED to HBM in
    before the kernel reads it (the kernel always computes in f32):
    'float32' reads 4x the bytes of the uint8 source, 'bfloat16' 2x,
    'uint8' 1x (requires the Mosaic toolchain to cast u8 in-kernel —
    probe with a try/except compile; round-1 toolchain could not)."""
    out_h, out_w = int(out_size[0]), int(out_size[1])
    b, s_dim, s_w, c = images.shape
    assert s_dim == s_w and s_dim % LANE == 0, (
        "canvas must be square with side a multiple of 128")
    assert c == 3, "fused warp expects 3-channel BGR images"
    orig_dtype = images.dtype
    stage_dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                "uint8": jnp.uint8}[canvas_dtype]
    imgs = images.astype(stage_dt)

    minv = invert_affine(jnp.asarray(m, jnp.float32))
    p_, q_, r_ = minv[:, 0, 0], minv[:, 0, 1], minv[:, 0, 2]
    s_, t_, u_ = minv[:, 1, 0], minv[:, 1, 1], minv[:, 1, 2]

    use_t = jnp.abs(t_) < jnp.abs(s_)
    imgs_sel = jnp.where(use_t[:, None, None, None],
                         jnp.swapaxes(imgs, 1, 2), imgs)
    p = jnp.where(use_t, s_, p_)
    q = jnp.where(use_t, t_, q_)
    r = jnp.where(use_t, u_, r_)
    s2 = jnp.where(use_t, p_, s_)
    t2 = jnp.where(use_t, q_, t_)
    u2 = jnp.where(use_t, r_, u_)
    safe_t = jnp.where(jnp.abs(t2) < 1e-6, 1e-6, t2)
    alpha = p - q * s2 / safe_t
    beta = q / safe_t
    gamma = r - q * u2 / safe_t

    with_jitter = jitter_gains is not None
    if with_jitter:
        dj = (jnp.ones((b,)) if do_jitter is None
              else jnp.asarray(do_jitter, jnp.float32))
        params = jnp.concatenate(
            [jnp.stack([alpha, beta, gamma, s2, t2, u2], axis=-1),
             jnp.asarray(jitter_gains, jnp.float32), dj[:, None]],
            axis=-1)  # (B, 10)
    else:
        params = jnp.concatenate(
            [jnp.stack([alpha, beta, gamma, s2, t2, u2], axis=-1),
             jnp.zeros((b, 4))], axis=-1)  # (B, 10)

    chw = jnp.moveaxis(imgs_sel, -1, 1)  # (B, 3, S, S)

    if multi_device():
        # mesh programs: GSPMD can't partition a Mosaic custom call on
        # its own — route through the batch-partitioned wrapper
        # (ops/partitioning.py); each device warps its batch shard
        # (SMEM chunking happens per shard inside _warp_chunk_impl).
        out_chw = _sharded_warp_chunk(with_jitter, interpret)(params, chw)
    else:
        out_chw = _warp_chunk_impl(params, chw, with_jitter=with_jitter,
                                   interpret=interpret)

    out = jnp.moveaxis(out_chw, 1, -1)[:, :out_h, :out_w, :]

    # cv2 BORDER_CONSTANT zero outside the source (original affine).
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    sx = (minv[:, 0, 0, None, None] * gx[None]
          + minv[:, 0, 1, None, None] * gy[None]
          + minv[:, 0, 2, None, None])
    sy = (minv[:, 1, 0, None, None] * gx[None]
          + minv[:, 1, 1, None, None] * gy[None]
          + minv[:, 1, 2, None, None])
    inside = ((sx > -1.0) & (sx < s_w) & (sy > -1.0) & (sy < s_dim))
    out = out * inside[..., None].astype(jnp.float32)

    if jnp.issubdtype(orig_dtype, jnp.integer):
        out = jnp.round(out)
        out = jnp.clip(out, jnp.iinfo(orig_dtype).min,
                       jnp.iinfo(orig_dtype).max)
    return out.astype(orig_dtype)
