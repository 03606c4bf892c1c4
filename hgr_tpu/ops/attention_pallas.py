"""Fused multi-head attention Pallas kernel for the ViT decoder.

The decoder attends over N = 145 tokens (12x12 patches + cls) with 8
heads of dim 32 (reference model/transformer.py:45-77). The whole
q·kᵀ → masked softmax → ·v chain for one (batch, head) fits comfortably
in VMEM (q/k/v are 145x32 ≈ 18 KB each; scores 145x145 ≈ 84 KB), so the
kernel runs one program per (batch*head) with zero HBM round-trips for
the intermediates — the unfused XLA chain materializes the 145x145
scores and attention tensors in HBM twice.

Sequence length is padded to a sublane multiple; padded key columns are
masked to -inf before the (float32) softmax so they contribute nothing.
The returned attention map matches the reference semantics (post-softmax,
used for visualization at libs/vis.py:116-184).

Training still differentiates through this op: a custom VJP recomputes
the backward pass with plain XLA einsums (cheap at this size, and XLA
fuses it into the backward graph).

Use via ``MultiTaskNet(use_pallas=True)`` / ``ModelConfig(
use_pallas_attention=True)``; ``tests/test_pallas.py`` pins equality with
the XLA path and ``bench.py --attention`` compares speed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend — absent on pure-CPU installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, a_ref, *, scale: float,
                      n_valid: int):
    """One (batch*head) program: full fused attention in VMEM."""
    q = q_ref[0].astype(jnp.float32)  # (Np, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Np, Np)

    n_pad = scores.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    scores = jnp.where(col < n_valid, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    attn = e / s

    out = jax.lax.dot_general(
        attn, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    o_ref[0] = out.astype(o_ref.dtype)
    a_ref[0] = attn.astype(a_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, scale: float):
    b, h, n, d = q.shape
    n_pad = _round_up(n, 8)
    d_pad = _round_up(d, 128)

    def pad(t):
        t = t.reshape(b * h, n, d)
        return jnp.pad(t, ((0, 0), (0, n_pad - n), (0, d_pad - d)))

    qp, kp, vp = pad(q), pad(k), pad(v)

    kernel = functools.partial(_attention_kernel, scale=scale, n_valid=n)
    out_p, attn_p = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, n_pad, d_pad), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, n_pad, n_pad), lambda i: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, n_pad, n_pad), jnp.float32),
        ),
    )(qp, kp, vp)

    out = out_p[:, :n, :d].reshape(b, h, n, d)
    attn = attn_p[:, :n, :n].reshape(b, h, n, n)
    return out, attn


def _xla_attention(q, k, v, scale: float):
    dots = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(q.dtype), v)
    return out, attn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale: float):
    """(out (B,H,N,D), attn (B,H,N,N) f32) — Pallas on TPU, XLA fallback."""
    if not _HAS_PLTPU or jax.default_backend() not in ("tpu", "axon"):
        return _xla_attention(q, k, v, scale)
    return _fused_attention_fwd_impl(q, k, v, scale)


def _fwd(q, k, v, scale):
    out, attn = fused_attention(q, k, v, scale)
    return (out, attn), (q, k, v, attn)


def _bwd(scale, res, grads):
    q, k, v, attn = res
    g_out, g_attn = grads
    attn_c = attn.astype(jnp.float32)
    g_out_f = g_out.astype(jnp.float32)
    v_f = v.astype(jnp.float32)

    # d attn from both the output path and any direct attn-map cotangent.
    d_attn = jnp.einsum("bhid,bhjd->bhij", g_out_f, v_f)
    if g_attn is not None:
        d_attn = d_attn + g_attn.astype(jnp.float32)
    # softmax backward: dS = A * (dA - sum(dA * A))
    d_scores = attn_c * (d_attn - jnp.sum(d_attn * attn_c, axis=-1,
                                          keepdims=True))
    d_scores = d_scores * scale
    q_f = q.astype(jnp.float32)
    k_f = k.astype(jnp.float32)
    dq = jnp.einsum("bhij,bhjd->bhid", d_scores, k_f).astype(q.dtype)
    dk = jnp.einsum("bhij,bhid->bhjd", d_scores, q_f).astype(k.dtype)
    dv = jnp.einsum("bhij,bhid->bhjd", attn_c, g_out_f).astype(v.dtype)
    return dq, dk, dv


fused_attention.defvjp(_fwd, _bwd)
