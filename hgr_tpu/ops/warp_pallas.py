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
# bench_suite config 7 compares the variants. Round-3 A/B (B=1024,
# same process): packed 36.4 / bf16 37.7 / f32 41.7 ms warp-only;
# with fused jitter packed and bf16 tie through the e2e graph (342.6 vs
# 342.7 ms at B=4096) and both beat f32 (359.9 ms). 'packed' also
# stages the fewest bytes (4/pixel vs bf16's 6) and is bit-identical
# to the planar kernels, so it is the default.
PREFERRED_CANVAS_DTYPE = "packed"


def _chunked_lane_gather(panels, idx):
    """Gather along the last axis of a (R, S) value stored as a list of
    (R, 128) panels: out[r, j] = value[r, idx[r, j]].

    idx: (R, W) int32 (one output chunk; W need not be 128 — Mosaic's
    dynamic_gather constrains the OPERAND to 128 lanes, the index/result
    tile just follows normal lane padding). Uses one tpu.dynamic_gather
    per source panel + selects.
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


def _chunk_spans(total: int, tail_ok: bool):
    """(offset, width) lane chunks covering [0, total). With ``tail_ok``
    the last chunk may be a partial 8-lane-aligned width (e.g. 192 ->
    [(0,128), (128,64)]); otherwise widths are full 128-lane panels
    rounded up (192 -> [(0,128), (128,128)])."""
    spans = []
    off = 0
    while off < total:
        w = min(LANE, total - off) if tail_ok else LANE
        spans.append((off, w))
        off += w
    return spans


def _taps(pos, s_dim: int):
    """Clamped bilinear taps (i0, i1, frac) for source positions ``pos``.

    The fraction is derived from the CLAMPED integer tap — not from
    ``pos - floor(pos)`` — and clipped to [0, 1]. XLA may duplicate the
    ``pos`` affine into different fusions with different FMA contraction;
    at an exactly-integer position the two copies can floor to k-1 vs k,
    and a fraction taken from the other copy then pairs weight ~1 with
    the wrong tap (a full-pixel misread, caught by the padded-canvas
    golden). Tying frac to the tap index keeps the blend self-consistent
    to 1 ulp regardless of which copy each consumer sees, and is exactly
    floor/frac for in-range positions."""
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, s_dim - 1)
    i1 = jnp.minimum(i0 + 1, s_dim - 1)
    frac = jnp.clip(pos - i0.astype(jnp.float32), 0.0, 1.0)
    return i0, i1, frac


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


def _pass2_and_store(h_chunks, out_ref, s2, t2, u2, *, s_dim: int,
                     ow_x: int, ow_y: int, tail_ok: bool):
    """Vertical resample (pass 2) shared by the planar and packed
    kernels: per-channel pass-1 chunks -> transpose -> chunked lane
    gather -> transpose back into ``out_ref``. Operates on fractional
    f32 intermediates, so it is planar in both kernels."""
    n_panels = s_dim // LANE
    ht_panels = []
    for ci in range(3):
        h = jnp.concatenate(h_chunks[ci], axis=1)  # (S, >=ow_x): H[k, x']
        ht = h[:, :ow_x].T  # (ow_x, S): Ht[x', k]
        ht_panels.append([ht[:, p * LANE:(p + 1) * LANE]
                          for p in range(n_panels)])

    out_chunks = [[], [], []]
    for off, w in _chunk_spans(ow_y, tail_ok):
        xprime_col = (jax.lax.broadcasted_iota(jnp.int32, (ow_x, w), 0)
                      .astype(jnp.float32))
        yprime = (jax.lax.broadcasted_iota(jnp.int32, (ow_x, w), 1)
                  .astype(jnp.float32) + off)
        pos = s2 * xprime_col + t2 * yprime + u2
        y0i, y1i, fy = _taps(pos, s_dim)
        for ci in range(3):
            top = _chunked_lane_gather(ht_panels[ci], y0i)
            bot = _chunked_lane_gather(ht_panels[ci], y1i)
            out_chunks[ci].append(top * (1.0 - fy) + bot * fy)

    for ci in range(3):
        out_t = jnp.concatenate(out_chunks[ci], axis=1)  # (ow_x, Y)
        out_ref[0, ci] = out_t.T  # (Y, ow_x): out[y', x']


def _warp_kernel(params_ref, img_ref, out_ref, *, s_dim: int, ow_x: int,
                 ow_y: int, with_jitter: bool, tail_ok: bool):
    """One image: img_ref (1, 3, S, S) -> out_ref (1, 3, Y, ow_x) where
    Y covers [0, ow_y) (exactly ow_y with partial tail chunks, rounded
    up to full 128-lane panels otherwise).

    Only the output window the caller will keep is resampled: pass 2
    computes ow_x rows instead of S (the round-2 kernel resampled the
    full S×S canvas and sliced afterwards — 25% wasted gathers at
    S=256/out=192), and the per-tap index arithmetic is hoisted out of
    the channel loop (it is channel-invariant; the round-2 kernel
    recomputed it 3×).

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
    chans = [img_ref[0, c].astype(jnp.float32) for c in range(3)]
    if with_jitter:
        jittered = _hsv_jitter_planes(
            chans[0], chans[1], chans[2], params_ref[i, 6],
            params_ref[i, 7], params_ref[i, 8])
        do_j = params_ref[i, 9] > 0.0
        chans = [jnp.where(do_j, j, c) for j, c in zip(jittered, chans)]

    n_panels = s_dim // LANE
    src_panels = [[ch[:, p * LANE:(p + 1) * LANE] for p in range(n_panels)]
                  for ch in chans]

    # ---- pass 1: horizontal resample over x' chunks in [0, ow_x) ----
    h_chunks = [[], [], []]
    for off, w in _chunk_spans(ow_x, tail_ok):
        k_col = (jax.lax.broadcasted_iota(jnp.int32, (s_dim, w), 0)
                 .astype(jnp.float32))
        xprime = (jax.lax.broadcasted_iota(jnp.int32, (s_dim, w), 1)
                  .astype(jnp.float32) + off)
        pos = alpha * xprime + beta * k_col + gamma
        x0i, x1i, fx = _taps(pos, s_dim)
        for ci in range(3):
            left = _chunked_lane_gather(src_panels[ci], x0i)
            right = _chunked_lane_gather(src_panels[ci], x1i)
            h_chunks[ci].append(left * (1.0 - fx) + right * fx)

    # ---- pass 2: vertical resample via transpose + lane gather ----
    _pass2_and_store(h_chunks, out_ref, s2, t2, u2, s_dim=s_dim,
                     ow_x=ow_x, ow_y=ow_y, tail_ok=tail_ok)


def _warp_kernel_packed(params_ref, img_ref, out_ref, *, s_dim: int,
                        ow_x: int, ow_y: int, with_jitter: bool,
                        tail_ok: bool):
    """Channel-packed variant: img_ref (1, S, S) int32 with one pixel
    per lane as B | G<<8 | R<<16 -> out_ref (1, 3, Y, ow_x).

    Pass 1 gathers the PACKED word, so ONE tpu.dynamic_gather per tap
    per panel fetches all three channels — 3x fewer pass-1 gathers and
    3x less canvas VMEM/HBM traffic than the planar kernel; taps unpack
    (shift/mask, cheap VPU) only for the f32 blend. Pass 2 blends
    fractional f32 values, so it stays planar (packing those would need
    a lossy 16-bit split). Numerics are bit-identical to the planar
    kernel: packing is lossless on 0-255 integers (the HSV jitter also
    emits exact 0-255 integers, so jitter->repack loses nothing) and
    the blends see the same f32 values in the same order."""
    i = pl.program_id(0)
    alpha = params_ref[i, 0]
    beta = params_ref[i, 1]
    gamma = params_ref[i, 2]
    s2 = params_ref[i, 3]
    t2 = params_ref[i, 4]
    u2 = params_ref[i, 5]

    packed = img_ref[0]  # (S, S) int32, value <= 0xFFFFFF (sign-safe)
    if with_jitter:
        bp = (packed & 0xFF).astype(jnp.float32)
        gp = ((packed >> 8) & 0xFF).astype(jnp.float32)
        rp = ((packed >> 16) & 0xFF).astype(jnp.float32)
        jb, jg, jr = _hsv_jitter_planes(
            bp, gp, rp, params_ref[i, 6], params_ref[i, 7],
            params_ref[i, 8])
        repacked = (jb.astype(jnp.int32)
                    | (jg.astype(jnp.int32) << 8)
                    | (jr.astype(jnp.int32) << 16))
        packed = jnp.where(params_ref[i, 9] > 0.0, repacked, packed)

    n_panels = s_dim // LANE
    src_panels = [packed[:, p * LANE:(p + 1) * LANE]
                  for p in range(n_panels)]

    # ---- pass 1: horizontal resample, one packed gather per tap ----
    h_chunks = [[], [], []]
    for off, w in _chunk_spans(ow_x, tail_ok):
        k_col = (jax.lax.broadcasted_iota(jnp.int32, (s_dim, w), 0)
                 .astype(jnp.float32))
        xprime = (jax.lax.broadcasted_iota(jnp.int32, (s_dim, w), 1)
                  .astype(jnp.float32) + off)
        pos = alpha * xprime + beta * k_col + gamma
        x0i, x1i, fx = _taps(pos, s_dim)
        left = _chunked_lane_gather(src_panels, x0i)
        right = _chunked_lane_gather(src_panels, x1i)
        for ci, sh in enumerate((0, 8, 16)):
            lv = ((left >> sh) & 0xFF).astype(jnp.float32)
            rv = ((right >> sh) & 0xFF).astype(jnp.float32)
            h_chunks[ci].append(lv * (1.0 - fx) + rv * fx)

    _pass2_and_store(h_chunks, out_ref, s2, t2, u2, s_dim=s_dim,
                     ow_x=ow_x, ow_y=ow_y, tail_ok=tail_ok)


# Partial (sub-128-lane) tail chunks: REJECTED by this Mosaic toolchain —
# the gather lowering asserts the index tile has the operand's exact
# shape (lowering.py:_gather_lowering_rule), so a 64-lane tail idx would
# need a 64-lane operand, which dynamic_gather forbids (128 lanes only).
# Probed on the real TPU (BENCH_LOG round 3). With False, chunks round up
# to full panels (same numerics, ~25% extra tail work at 192/256).
TAIL_CHUNKS_OK = False


def _out_extent(ow: int, tail_ok: bool) -> int:
    """Concatenated output width the kernel actually produces."""
    return sum(w for _, w in _chunk_spans(ow, tail_ok))


def _warp_one_call(params_c: Array, chw_c: Array, *, ow_x: int, ow_y: int,
                   with_jitter: bool, interpret: bool,
                   packed: bool = False) -> Array:
    """One pallas_call over a ≤_MAX_GRID_B batch chunk. Output block is
    (1, 3, Y, ow_x) with Y = chunk-covered extent of ow_y. ``packed``
    input is (B, S, S) int32 channel-packed; planar is (B, 3, S, S)."""
    nb = chw_c.shape[0]
    s_dim = chw_c.shape[-1]
    tail_ok = TAIL_CHUNKS_OK
    y_ext = _out_extent(ow_y, tail_ok)
    if packed:
        kernel = functools.partial(_warp_kernel_packed, s_dim=s_dim,
                                   ow_x=ow_x, ow_y=ow_y,
                                   with_jitter=with_jitter, tail_ok=tail_ok)
        in_spec = pl.BlockSpec((1, s_dim, s_dim),
                               lambda i, params: (i, 0, 0))
    else:
        kernel = functools.partial(_warp_kernel, s_dim=s_dim, ow_x=ow_x,
                                   ow_y=ow_y, with_jitter=with_jitter,
                                   tail_ok=tail_ok)
        in_spec = pl.BlockSpec((1, 3, s_dim, s_dim),
                               lambda i, params: (i, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[in_spec],
        out_specs=pl.BlockSpec((1, 3, y_ext, ow_x),
                               lambda i, params: (i, 0, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 3, y_ext, ow_x), jnp.float32),
        interpret=interpret,
    )(params_c, chw_c)


def _warp_chunk_impl(params_c: Array, chw_c: Array, *, ow_x: int, ow_y: int,
                     with_jitter: bool, interpret: bool,
                     packed: bool = False) -> Array:
    """Warp any batch size, splitting into ≤_MAX_GRID_B pallas_calls.

    Scalar-prefetch SMEM + grid bookkeeping overflow the 1 MB SMEM just
    past B=1024 on this toolchain (measured: B=2048 exceeds it by 144
    bytes). The chunking lives HERE — inside the unit the partitioner
    lowers per shard — because the SMEM cap is per device: a global
    B=8192 over 8 devices is a single fine call per device, not eight
    sliced ones."""
    b = chw_c.shape[0]
    if b <= _MAX_GRID_B:
        return _warp_one_call(params_c, chw_c, ow_x=ow_x, ow_y=ow_y,
                              with_jitter=with_jitter, interpret=interpret,
                              packed=packed)
    return jnp.concatenate(
        [_warp_one_call(params_c[s:s + _MAX_GRID_B],
                        chw_c[s:s + _MAX_GRID_B], ow_x=ow_x, ow_y=ow_y,
                        with_jitter=with_jitter, interpret=interpret,
                        packed=packed)
         for s in range(0, b, _MAX_GRID_B)], axis=0)


@functools.lru_cache(maxsize=16)
def _sharded_warp_chunk(ow_x: int, ow_y: int, with_jitter: bool,
                        interpret: bool, packed: bool = False):
    """Batch-partitioned warp launcher (one cached op per config)."""
    return batch_partitioned(
        lambda params_c, chw_c: _warp_chunk_impl(
            params_c, chw_c, ow_x=ow_x, ow_y=ow_y, with_jitter=with_jitter,
            interpret=interpret, packed=packed),
        sharding_rule=("b p, b s t -> b c y x" if packed
                       else "b p, b c s t -> b c y x"))


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
    probe with a try/except compile; round-1 toolchain could not);
    'packed' stages ONE int32 word per pixel (B | G<<8 | R<<16) so each
    pass-1 gather fetches all three channels — bit-identical to the
    planar kernels for 0-255-integer images (the training canvas is
    uint8; float inputs are rounded to the nearest level, which the
    output quantization step reapplies anyway)."""
    out_h, out_w = int(out_size[0]), int(out_size[1])
    b, s_dim, s_w, c = images.shape
    assert s_dim == s_w and s_dim % LANE == 0, (
        "canvas must be square with side a multiple of 128")
    assert c == 3, "fused warp expects 3-channel BGR images"
    orig_dtype = images.dtype
    packed_mode = canvas_dtype == "packed"
    if packed_mode:
        imgs = images
    else:
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

    if packed_mode:
        # One int32 word per pixel: B | G<<8 | R<<16 (<= 0xFFFFFF, so
        # arithmetic >> in the kernel never sees the sign bit). Lossless
        # for integer images; floats round to the nearest 0-255 level.
        if jnp.issubdtype(imgs_sel.dtype, jnp.integer):
            u = imgs_sel.astype(jnp.int32)
        else:
            u = jnp.clip(jnp.round(imgs_sel.astype(jnp.float32)),
                         0.0, 255.0).astype(jnp.int32)
        chw = (u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16))
    else:
        chw = jnp.moveaxis(imgs_sel, -1, 1)  # (B, 3, S, S)

    # The kernel only resamples the output window (8-lane aligned); the
    # canvas beyond it is never warped (it was in round 2 — 25% wasted
    # pass-2 gathers at 256->192).
    ow_x = min(-(-out_w // 8) * 8, s_dim)
    ow_y = min(-(-out_h // 8) * 8, s_dim)
    if multi_device():
        # mesh programs: GSPMD can't partition a Mosaic custom call on
        # its own — route through the batch-partitioned wrapper
        # (ops/partitioning.py); each device warps its batch shard
        # (SMEM chunking happens per shard inside _warp_chunk_impl).
        out_chw = _sharded_warp_chunk(ow_x, ow_y, with_jitter,
                                      interpret, packed_mode)(params, chw)
    else:
        out_chw = _warp_chunk_impl(params, chw, ow_x=ow_x, ow_y=ow_y,
                                   with_jitter=with_jitter,
                                   interpret=interpret,
                                   packed=packed_mode)

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
