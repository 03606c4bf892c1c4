"""Fused attention core (no attention-map output) for the ViT decoder.

Round-2 history: a first fused-attention kernel was built, batch-tiled,
and removed after losing its win-or-die A/B. Profiling in round 2b found
why it lost — and why the XLA attention chain is the #1 forward cost:
each transformer layer spends most of its ~48 ms (B=4096, v5e) on HBM
traffic the attention math itself doesn't need — the padded
(B,8,145,145) float32 score/attention tensors, plus the heads-first
transposes whose (…,145,32) layouts tile-pad 32→128 lanes (4× bytes).
The old kernel reproduced all of that by taking pre-transposed q/k/v and
emitting the full padded attention map as an output.

This kernel takes the ``to_qkv`` Dense output in its NATURAL layout
(B, N, 3·H·D) — no split, no transposes, no padded HBM layouts — and
for each image computes every head's q·kᵀ → masked f32 softmax → ·v
entirely in VMEM (per-head 32-lane static slices), writing the
(B, N, H·D) output ready for ``to_out``. Measured at (4096, 145, 768):
~6 ms vs ~26 ms for XLA's split+transpose+chain — and the N×N
intermediates never touch HBM.

The attention MAP (reference visualization semantics,
model/transformer.py:90-96 / libs/vis.py:116-184) is not produced here:
the model keeps the plain XLA chain for the last layer when the caller
asks for the map, and uses this core everywhere else (models/vit.py).

Backward: custom VJP recomputes the attention weights from qkv with XLA
einsums — no N×N residual is saved, so training keeps the forward HBM
savings and pays one (cheap, fused) recompute in the bwd graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas TPU backend — absent on minimal/older jax installs; the
    # XLA fallback below keeps the model importable and usable without it
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pl = None
    _HAS_PLTPU = False

Array = jax.Array


def _attention_qkv_kernel(qkv_ref, o_ref, *, heads: int, head_dim: int,
                          scale: float, n_valid: int):
    """One image per program: all heads' attention fully in VMEM."""
    x = qkv_ref[0]  # (N, 3*H*D)
    hd = heads * head_dim
    n = x.shape[0]
    # key columns beyond the real sequence must not win the softmax
    # (VMEM tile padding is not guaranteed zero, and zero scores would
    # still take weight); the mask is head-invariant — build it once.
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) < n_valid
    for h in range(heads):
        lo = h * head_dim
        q = x[:, lo:lo + head_dim].astype(jnp.float32)
        k = x[:, hd + lo:hd + lo + head_dim].astype(jnp.float32)
        v = x[:, 2 * hd + lo:2 * hd + lo + head_dim].astype(jnp.float32)

        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (N, N)
        scores = jnp.where(col_ok, scores, -jnp.inf)

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        # mirror the XLA path: f32 attn cast to the compute dtype before
        # the value matmul (vit.py Attention.__call__).
        attn = (e / s).astype(o_ref.dtype)

        out = jax.lax.dot_general(
            attn, v.astype(o_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, lo:lo + head_dim] = out.astype(o_ref.dtype)


def _attention_qkv_impl(qkv: Array, heads: int, head_dim: int, scale: float,
                        interpret: bool = False) -> Array:
    b, n, f = qkv.shape
    assert f == 3 * heads * head_dim
    kernel = functools.partial(_attention_qkv_kernel, heads=heads,
                               head_dim=head_dim, scale=scale, n_valid=n)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, f), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, n, f // 3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, f // 3), qkv.dtype),
        interpret=interpret,
    )(qkv)


@functools.lru_cache(maxsize=32)
def _sharded_fwd(heads: int, head_dim: int, scale: float, interpret: bool):
    """Batch-partitioned fwd launcher for multi-device (mesh) programs —
    GSPMD cannot partition a Mosaic custom call on its own
    (ops/partitioning.py); one cached op per static config."""
    from hgr_tpu.ops.partitioning import batch_partitioned

    return batch_partitioned(
        lambda qkv: _attention_qkv_impl(qkv, heads, head_dim, scale,
                                        interpret),
        sharding_rule="b n f -> b n g")


@functools.lru_cache(maxsize=32)
def _sharded_bwd(heads: int, head_dim: int, scale: float, interpret: bool):
    from hgr_tpu.ops.partitioning import batch_partitioned

    return batch_partitioned(
        lambda qkv, g: _attention_qkv_bwd_impl(qkv, g, heads, head_dim,
                                               scale, interpret),
        sharding_rule="b n f, b n g -> b n f")


def split_heads(qkv: Array, heads: int, head_dim: int):
    """(B, N, 3·H·D) -> three (B, H, N, D) (reference transformer.py:66:
    chunk(3) then heads-first rearrange)."""
    b, n, _ = qkv.shape
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hf = lambda t: t.reshape(b, n, heads, head_dim).transpose(0, 2, 1, 3)
    return hf(q), hf(k), hf(v)


def merge_heads(t: Array) -> Array:
    """(B, H, N, D) -> (B, N, H·D)."""
    b, h, n, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _xla_attention_core(q: Array, k: Array, v: Array, scale: float,
                        precision=None, return_attn: bool = False):
    """Unfused chain on heads-first tensors. ``return_attn=True`` also
    returns the post-softmax map — the single implementation the
    models/vit.py need-map path and the kernel parity tests both use."""
    dots = jnp.einsum("bhid,bhjd->bhij", q, k,
                      precision=precision).astype(jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(q.dtype), v,
                     precision=precision)
    return (out, attn) if return_attn else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def fused_attention_qkv(qkv: Array, heads: int, head_dim: int, scale: float,
                        interpret: bool = False, precision=None) -> Array:
    """out (B, N, H·D) = multi-head softmax(q kᵀ · scale) v, taking the
    packed qkv projection (B, N, 3·H·D) directly.

    Pallas on TPU (no N×N HBM intermediates, no transposes); XLA
    fallback elsewhere (``precision`` applies to the fallback einsums;
    the kernel always accumulates in float32). Softmax statistics in
    float32 either way — same numerics as the unfused path.
    """
    if not _HAS_PLTPU or (not interpret
                          and jax.default_backend() not in ("tpu", "axon")):
        q, k, v = split_heads(qkv, heads, head_dim)
        return merge_heads(_xla_attention_core(q, k, v, scale, precision))
    from hgr_tpu.ops.partitioning import multi_device

    if multi_device():
        return _sharded_fwd(heads, head_dim, scale, interpret)(qkv)
    return _attention_qkv_impl(qkv, heads, head_dim, scale,
                               interpret=interpret)


def _attention_qkv_bwd_kernel(qkv_ref, g_ref, d_ref, *, heads: int,
                              head_dim: int, scale: float, n_valid: int):
    """One image per program: recompute attn, then dq/dk/dv — all in
    VMEM (the XLA-einsum recompute materializes four padded f32 N×N
    tensors per layer in HBM and made the train step SLOWER than the
    unfused chain; measured 195 vs 178.6 ms at B=512)."""
    x = qkv_ref[0]  # (N, 3*H*D)
    g = g_ref[0]  # (N, H*D)
    hd = heads * head_dim
    n = x.shape[0]
    col_ok = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) < n_valid
    for h in range(heads):
        lo = h * head_dim
        q = x[:, lo:lo + head_dim].astype(jnp.float32)
        k = x[:, hd + lo:hd + lo + head_dim].astype(jnp.float32)
        v = x[:, 2 * hd + lo:2 * hd + lo + head_dim].astype(jnp.float32)
        gh = g[:, lo:lo + head_dim].astype(jnp.float32)

        # --- recompute the forward softmax (same math as the fwd kernel)
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(col_ok, scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        attn = e / s  # (N, N) f32

        # --- gradients
        d_attn = jax.lax.dot_general(
            gh, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (N, N)
        d_scores = attn * (
            d_attn - jnp.sum(d_attn * attn, axis=-1, keepdims=True))
        d_scores = d_scores * scale
        # padded key columns carry attn == 0 already (masked -inf above),
        # so d_scores is zero there — no extra masking needed.
        dq = jax.lax.dot_general(
            d_scores, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            d_scores.T, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dv must differentiate the forward as EXECUTED: the fwd kernel
        # casts attn to the compute dtype before the value matmul, so
        # quantize the recomputed attn the same way (round-trip through
        # the output dtype keeps the dot f32×f32 for Mosaic).
        attn_q = attn.astype(d_ref.dtype).astype(jnp.float32)
        dv = jax.lax.dot_general(
            attn_q.T, gh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        d_ref[0, :, lo:lo + head_dim] = dq.astype(d_ref.dtype)
        d_ref[0, :, hd + lo:hd + lo + head_dim] = dk.astype(d_ref.dtype)
        d_ref[0, :, 2 * hd + lo:2 * hd + lo + head_dim] = \
            dv.astype(d_ref.dtype)


def _attention_qkv_bwd_impl(qkv: Array, g_out: Array, heads: int,
                            head_dim: int, scale: float,
                            interpret: bool = False) -> Array:
    b, n, f = qkv.shape
    kernel = functools.partial(_attention_qkv_bwd_kernel, heads=heads,
                               head_dim=head_dim, scale=scale, n_valid=n)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, f), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n, f // 3), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, f), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, f), qkv.dtype),
        interpret=interpret,
    )(qkv, g_out)


def _xla_attention_qkv_bwd(qkv, g_out, heads, head_dim, scale):
    """Fallback bwd: recompute with einsums (CPU/interpret-free path)."""
    q, k, v = split_heads(qkv, heads, head_dim)
    b, n, _ = qkv.shape
    q_f = q.astype(jnp.float32)
    k_f = k.astype(jnp.float32)
    v_f = v.astype(jnp.float32)
    g_f = (g_out.reshape(b, n, heads, head_dim)
           .transpose(0, 2, 1, 3).astype(jnp.float32))

    dots = jnp.einsum("bhid,bhjd->bhij", q_f, k_f) * scale
    attn = jax.nn.softmax(dots, axis=-1)

    d_attn = jnp.einsum("bhid,bhjd->bhij", g_f, v_f)
    # softmax backward: dS = A * (dA - sum(dA * A))
    d_scores = attn * (d_attn - jnp.sum(d_attn * attn, axis=-1,
                                        keepdims=True))
    d_scores = d_scores * scale
    dq = jnp.einsum("bhij,bhjd->bhid", d_scores, k_f)
    dk = jnp.einsum("bhij,bhid->bhjd", d_scores, q_f)
    # match the executed forward, which casts attn to the compute dtype
    # before the value matmul (see _attention_qkv_kernel)
    attn_q = attn.astype(qkv.dtype).astype(jnp.float32)
    dv = jnp.einsum("bhij,bhid->bhjd", attn_q, g_f)
    return jnp.concatenate(
        [merge_heads(t).astype(qkv.dtype) for t in (dq, dk, dv)], axis=-1)


# ---------------------------------------------------------------------------
# Split-operand variant for tensor-parallel meshes.
#
# The packed (B, N, 3·H·D) layout cannot be head-sharded: contiguous
# 'model'-axis sharding of the packed dim mixes q columns with k columns
# on every device. Taking q, k, v as THREE (B, N, H·D) operands makes
# each one head-aligned under contiguous sharding (H·D / tp is a whole
# number of heads), so a head-partitioned custom_partitioning rule
# (ops/partitioning.py:head_partitioned) can run the SAME VMEM kernel on
# each device's local head group — attention has no cross-head math.
# This is what lets TP meshes keep the fused Pallas core instead of
# falling back to the XLA chain (models/vit.py Attention.fused='split').


def _split_fwd_impl(q: Array, k: Array, v: Array, heads: int, head_dim: int,
                    scale: float, interpret: bool = False) -> Array:
    # split → concat is a no-op for XLA when shardings agree; under TP it
    # is exactly the local repack the kernel's q|k|v layout needs.
    return _attention_qkv_impl(jnp.concatenate([q, k, v], axis=-1),
                               heads, head_dim, scale, interpret)


def _split_bwd_impl(q: Array, k: Array, v: Array, g_out: Array, heads: int,
                    head_dim: int, scale: float, interpret: bool = False):
    d = _attention_qkv_bwd_impl(jnp.concatenate([q, k, v], axis=-1), g_out,
                                heads, head_dim, scale, interpret)
    hd = heads * head_dim
    return d[..., :hd], d[..., hd:2 * hd], d[..., 2 * hd:]


@functools.lru_cache(maxsize=32)
def _sharded_split_fwd(heads: int, head_dim: int, scale: float,
                       interpret: bool):
    from hgr_tpu.ops.partitioning import head_partitioned

    def make(h):
        return lambda q, k, v: _split_fwd_impl(q, k, v, h, head_dim, scale,
                                               interpret)

    return head_partitioned(make(heads), make, heads, head_dim,
                            sharding_rule="b n h, b n h, b n h -> b n h")


@functools.lru_cache(maxsize=32)
def _sharded_split_bwd(heads: int, head_dim: int, scale: float,
                       interpret: bool):
    from hgr_tpu.ops.partitioning import head_partitioned

    def make(h):
        return lambda q, k, v, g: _split_bwd_impl(q, k, v, g, h, head_dim,
                                                  scale, interpret)

    return head_partitioned(
        make(heads), make, heads, head_dim,
        sharding_rule="b n h, b n h, b n h, b n h -> b n h, b n h, b n h")


def _heads_first(t: Array, heads: int, head_dim: int) -> Array:
    b, n, _ = t.shape
    return t.reshape(b, n, heads, head_dim).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_attention_split(q: Array, k: Array, v: Array, heads: int,
                          head_dim: int, scale: float,
                          interpret: bool = False, precision=None) -> Array:
    """``fused_attention_qkv`` taking q, k, v as separate (B, N, H·D)
    operands — the head-shardable form for tensor-parallel meshes.

    Same kernel, same numerics (f32 softmax stats, attn cast to the
    compute dtype before the value matmul). On multi-device processes
    the head-partitioned rule shards dim 2 over the mesh's 'model' axes
    and dim 0 over the data axes; single-device and non-TPU paths match
    the packed variant's routing.
    """
    if not _HAS_PLTPU or (not interpret
                          and jax.default_backend() not in ("tpu", "axon")):
        out = _xla_attention_core(
            _heads_first(q, heads, head_dim),
            _heads_first(k, heads, head_dim),
            _heads_first(v, heads, head_dim), scale, precision)
        return merge_heads(out)
    from hgr_tpu.ops.partitioning import multi_device

    if multi_device():
        return _sharded_split_fwd(heads, head_dim, scale, interpret)(q, k, v)
    return _split_fwd_impl(q, k, v, heads, head_dim, scale, interpret)


def _split_vjp_fwd(q, k, v, heads, head_dim, scale, interpret, precision):
    return (fused_attention_split(q, k, v, heads, head_dim, scale, interpret,
                                  precision), (q, k, v))


def _split_vjp_bwd(heads, head_dim, scale, interpret, precision, res, g_out):
    q, k, v = res
    if not _HAS_PLTPU or (not interpret
                          and jax.default_backend() not in ("tpu", "axon")):
        d = _xla_attention_qkv_bwd(jnp.concatenate([q, k, v], axis=-1), g_out,
                                   heads, head_dim, scale)
        hd = heads * head_dim
        return d[..., :hd], d[..., hd:2 * hd], d[..., 2 * hd:]
    from hgr_tpu.ops.partitioning import multi_device

    if multi_device():
        return _sharded_split_bwd(heads, head_dim, scale,
                                  interpret)(q, k, v, g_out)
    return _split_bwd_impl(q, k, v, g_out, heads, head_dim, scale, interpret)


fused_attention_split.defvjp(_split_vjp_fwd, _split_vjp_bwd)


def _fwd(qkv, heads, head_dim, scale, interpret, precision):
    return (fused_attention_qkv(qkv, heads, head_dim, scale, interpret,
                                precision), qkv)


def _bwd(heads, head_dim, scale, interpret, precision, qkv, g_out):
    # No N×N residual was saved (that is the point of the fused
    # forward); the bwd kernel recomputes attn in VMEM. Softmax stats are
    # f32 (as in the fwd) and attn is quantized to the compute dtype
    # before dv so the VJP differentiates the forward as executed.
    if not _HAS_PLTPU or (not interpret
                          and jax.default_backend() not in ("tpu", "axon")):
        return (_xla_attention_qkv_bwd(qkv, g_out, heads, head_dim, scale),)
    from hgr_tpu.ops.partitioning import multi_device

    if multi_device():
        return (_sharded_bwd(heads, head_dim, scale, interpret)(qkv, g_out),)
    return (_attention_qkv_bwd_impl(qkv, g_out, heads, head_dim, scale,
                                    interpret=interpret),)


fused_attention_qkv.defvjp(_fwd, _bwd)
