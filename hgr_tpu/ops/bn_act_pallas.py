"""Fused BatchNorm(+SiLU) training epilogue with a hand-derived
backward — the kernel-level lever the round-3 verdict asked for on the
conv backward's BN coupling (VERDICT r3 #3; HLO attribution measured
the autodiff BN coupling chains at 30.0 ms of the 247 ms B=1024 step).

Why a custom backward instead of autodiff: XLA differentiates the
normalize chain into several elementwise+reduce passes over the
(B,H,W,C) conv activation, each reading/writing f32 HBM (the f32 chain
is REQUIRED for accuracy — BENCH_LOG round 4 rejected the bf16-BN knob
at -0.20 test F1). The closed-form backward needs exactly TWO passes:

  pass A (reduce):   T1_c = sum dz,  T2_c = sum dz * xhat
  pass B (element):  dy = r*gamma * (dz - T1/M - xhat*T2/M)

with dz = g * silu'(z) and xhat, z recomputed in-register from y. The
Pallas kernels read the bf16 activation/cotangent ONCE per pass and do
ALL math in f32 registers — bf16-knob byte traffic at f32-chain
numerics (no bf16 intermediate STORES, which is what made the flax
bf16 chain inaccurate).

``bn_act(y, gamma, beta)`` returns (silu(bn(y)), batch_mean, batch_var)
with flax BatchNorm semantics (biased variance, f32 statistics); the
mean/var outputs feed running-stat updates and are NOT differentiated.
The custom backward is routed to the Pallas pair on TPU and to an
identical pure-jnp implementation elsewhere (CPU tests pin both the
backward math against autodiff of the plain chain and the two routes
against each other).

STATUS (round 5): integrated into models/layers.ConvBnAct behind
HGR_TPU_FUSED_BN (layers._FusedBNAct) and measured on the real chip —
it LOSES at train-step level (B=1024 demixed step: 640.1 ms fused vs
455.7 ms flax route, bench_artifacts/r5/slope_demix_fused*.txt; the
plain step OOMs at B=1024 with it on). The custom-call boundary forces
layout copies of the full (M, C)-reshaped activation and cotangent
before each kernel (observed as bf16[M,C] HLO-temp copies in the OOM
dump) — more HBM traffic than the autodiff chain's fused reads, the
exact cost the kernel was meant to remove. Default stays OFF
(_FUSED_BN_AUTO = False); the op remains available and
grad/stat-equivalence is pinned by tests/test_fused_bn.py. Same
measured-and-rejected register as the s2d/dense_grad stride-2
lowerings (BENCH_LOG round 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas TPU backend — absent on minimal installs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pl = None
    _HAS_PLTPU = False

Array = jax.Array

_BLOCK_ROWS = 1024  # rows per grid step; (1024, C<=512) tiles fit VMEM


def _silu_grads(z):
    s = jax.nn.sigmoid(z)
    return s * (1.0 + z * (1.0 - s))


def _fwd_chain(y, gamma, beta, eps, act=True):
    """Plain XLA forward (fwd fusion was never the bottleneck)."""
    yf = y.astype(jnp.float32)
    axes = tuple(range(y.ndim - 1))
    mean = jnp.mean(yf, axis=axes)
    var = jnp.mean(jnp.square(yf - mean), axis=axes)
    r = jax.lax.rsqrt(var + eps)
    z = (yf - mean) * r * gamma + beta
    out = ((z * jax.nn.sigmoid(z)) if act else z).astype(y.dtype)
    return out, mean, var


def _bwd_reference(y, gamma, beta, mean, var, g, eps, act=True):
    """Closed-form backward, pure jnp (CPU route + oracle for the
    kernels). Identical math to the Pallas pair."""
    yf = y.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    r = jax.lax.rsqrt(var + eps)
    xhat = (yf - mean) * r
    z = xhat * gamma + beta
    dz = gf * _silu_grads(z) if act else gf
    axes = tuple(range(y.ndim - 1))
    t1 = jnp.sum(dz, axis=axes)
    t2 = jnp.sum(dz * xhat, axis=axes)
    m = jnp.prod(jnp.asarray(y.shape[:-1])).astype(jnp.float32)
    dy = (r * gamma) * (dz - t1 / m - xhat * (t2 / m))
    return dy.astype(y.dtype), t2, t1  # (dy, dgamma, dbeta)


# ---------------------------------------------------------------- pallas


def _reduce_kernel(y_ref, g_ref, mean_ref, r_ref, gamma_ref, beta_ref,
                   t1_ref, t2_ref, *, act):
    """Sequential-grid accumulator: every grid step maps to the SAME
    (8, C) output tile (TPU grids execute in order); step 0 zeroes it,
    later steps add their block's partial sums into row 0."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        t1_ref[...] = jnp.zeros_like(t1_ref)
        t2_ref[...] = jnp.zeros_like(t2_ref)

    yf = y_ref[...].astype(jnp.float32)
    gf = g_ref[...].astype(jnp.float32)
    mean = mean_ref[...].astype(jnp.float32)
    r = r_ref[...]
    gamma = gamma_ref[...]
    beta = beta_ref[...]
    xhat = (yf - mean) * r
    z = xhat * gamma + beta
    # rows past M exist only in the LAST block (host-side pad): their g
    # rows are zero-padded, so dz is already zero there — no mask needed
    dz = gf * _silu_grads(z) if act else gf
    t1_ref[0, :] += jnp.sum(dz, axis=0)
    t2_ref[0, :] += jnp.sum(dz * xhat, axis=0)


def _elem_kernel(y_ref, g_ref, mean_ref, r_ref, gamma_ref, beta_ref,
                 t1m_ref, t2m_ref, dy_ref, *, act):
    yf = y_ref[...].astype(jnp.float32)
    gf = g_ref[...].astype(jnp.float32)
    mean = mean_ref[...].astype(jnp.float32)
    r = r_ref[...]
    gamma = gamma_ref[...]
    beta = beta_ref[...]
    xhat = (yf - mean) * r
    z = xhat * gamma + beta
    dz = gf * _silu_grads(z) if act else gf
    dy = (r * gamma) * (dz - t1m_ref[...] - xhat * t2m_ref[...])
    dy_ref[...] = dy.astype(dy_ref.dtype)


def _bwd_pallas(y, gamma, beta, mean, var, g, eps, act=True):
    orig_shape = y.shape
    c = y.shape[-1]
    m = 1
    for d in y.shape[:-1]:
        m *= d
    y2 = y.reshape(m, c)
    g2 = g.reshape(m, c)
    nblocks = -(-m // _BLOCK_ROWS)
    m_pad = nblocks * _BLOCK_ROWS
    if m_pad != m:
        y2 = jnp.pad(y2, ((0, m_pad - m), (0, 0)))
        g2 = jnp.pad(g2, ((0, m_pad - m), (0, 0)))  # zero rows -> dz=0
    r = jax.lax.rsqrt(var + eps)
    mean1 = mean.reshape(1, c)
    r1 = r.reshape(1, c)
    gamma1 = gamma.reshape(1, c)
    beta1 = beta.reshape(1, c)

    vec_spec = pl.BlockSpec((1, c), lambda i: (0, 0))
    row_spec = pl.BlockSpec((_BLOCK_ROWS, c), lambda i: (i, 0))
    acc_spec = pl.BlockSpec((8, c), lambda i: (0, 0))  # same tile always
    t1p, t2p = pl.pallas_call(
        functools.partial(_reduce_kernel, act=act),
        grid=(nblocks,),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec, vec_spec,
                  vec_spec],
        out_specs=[acc_spec, acc_spec],
        out_shape=[jax.ShapeDtypeStruct((8, c), jnp.float32),
                   jax.ShapeDtypeStruct((8, c), jnp.float32)],
    )(y2, g2, mean1, r1, gamma1, beta1)
    t1 = t1p[0]
    t2 = t2p[0]

    mf = jnp.float32(m)
    dy2 = pl.pallas_call(
        functools.partial(_elem_kernel, act=act),
        grid=(nblocks,),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec, vec_spec,
                  vec_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, c), y.dtype),
    )(y2, g2, mean1, r1, gamma1, beta1,
      (t1 / mf).reshape(1, c), (t2 / mf).reshape(1, c))
    dy = dy2[:m].reshape(orig_shape)
    return dy, t2, t1


def _use_pallas() -> bool:
    """Route the backward to the Pallas pair: TPU backend, single-device
    process only. Under a multi-device mesh the closed-form jnp backward
    is used instead: its batch reductions are plain jnp sums, so GSPMD
    partitions them into per-shard partials + cross-device psum — exactly
    the global-batch-stat semantics the (equally global) forward has
    under pjit. The Pallas pair would need a custom_partitioning rule
    whose reduce stage psums t1/t2; until that exists the jnp route is
    the correct (and still two-pass closed-form) mesh lowering."""
    if not _HAS_PLTPU:
        return False
    try:
        from hgr_tpu.ops.partitioning import multi_device

        return jax.default_backend() == "tpu" and not multi_device()
    except Exception:  # pragma: no cover
        return False


# ------------------------------------------------------------ custom vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_act(y: Array, gamma: Array, beta: Array, eps: float = 1e-5,
           act: bool = True):
    """[silu](batchnorm(y)) with batch statistics, training mode.

    ``act=False`` drops the SiLU (the ``use_act=False`` ConvBnAct
    layers, e.g. ResBasicBlock's cv2 / downsample — reference
    model/gelan.py:59-87): out = z, dz = g, same two-pass backward.

    Returns (out, batch_mean, batch_var); mean/var feed running-stat
    updates and carry NO gradient (their cotangents are ignored — the
    flax training path treats stat updates as non-differentiated too).
    """
    return _fwd_chain(y, gamma, beta, eps, act)


def _bn_act_fwd(y, gamma, beta, eps, act):
    out, mean, var = _fwd_chain(y, gamma, beta, eps, act)
    return (out, mean, var), (y, gamma, beta, mean, var)


def _bn_act_bwd(eps, act, res, cots):
    y, gamma, beta, mean, var = res
    g, _, _ = cots  # mean/var cotangents ignored (non-differentiated)
    impl = _bwd_pallas if _use_pallas() else _bwd_reference
    dy, dgamma, dbeta = impl(y, gamma, beta, mean, var, g, eps, act)
    return dy, dgamma, dbeta


bn_act.defvjp(_bn_act_fwd, _bn_act_bwd)
