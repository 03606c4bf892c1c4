"""Fused BN+SiLU training epilogue (ops/bn_act_pallas.py): hand-derived
backward vs autodiff of the plain chain, and the Pallas two-pass pair
(interpret mode) vs the reference backward. The chip-side cost A/B
lives in tools/bn_epilogue_ab.py (BENCH_LOG round 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.ops import bn_act_pallas as bna

EPS = 1e-5


def _plain_chain(y, gamma, beta):
    yf = y.astype(jnp.float32)
    mean = jnp.mean(yf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(yf - mean), axis=(0, 1, 2))
    z = (yf - mean) * jax.lax.rsqrt(var + EPS) * gamma + beta
    return (z * jax.nn.sigmoid(z)).astype(y.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_custom_backward_matches_autodiff(dtype):
    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.randn(4, 6, 6, 32), dtype)
    gamma = jnp.asarray(rng.rand(32) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.randn(4, 6, 6, 32), dtype)

    def loss_plain(y_, g_, b_):
        return jnp.sum(_plain_chain(y_, g_, b_).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    def loss_custom(y_, g_, b_):
        out, _, _ = bna.bn_act(y_, g_, b_, EPS)
        return jnp.sum(out.astype(jnp.float32) * ct.astype(jnp.float32))

    gp = jax.grad(loss_plain, argnums=(0, 1, 2))(y, gamma, beta)
    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(y, gamma, beta)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    for a, b in zip(gp, gc):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=tol, atol=tol)


def test_forward_outputs_and_stats():
    rng = np.random.RandomState(1)
    y = jnp.asarray(rng.randn(2, 5, 5, 16), jnp.float32)
    gamma = jnp.ones(16)
    beta = jnp.zeros(16)
    out, mean, var = bna.bn_act(y, gamma, beta, EPS)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(y).mean((0, 1, 2)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(var),
                               np.asarray(y).var((0, 1, 2)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_plain_chain(y, gamma, beta)),
                               atol=1e-6)


@pytest.mark.skipif(not bna._HAS_PLTPU, reason="pallas unavailable")
@pytest.mark.parametrize("shape", [(2, 6, 6, 32), (1, 33, 7, 64)])
def test_pallas_backward_matches_reference(shape):
    """Interpret-mode Pallas pair vs the pure-jnp reference backward —
    same math, so tight tolerance. The odd (33, 7) spatial shape forces
    the padded last row-block path."""
    from jax.experimental import pallas as pl  # noqa: F401

    rng = np.random.RandomState(2)
    y = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    c = shape[-1]
    gamma = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    g = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
    _, mean, var = bna._fwd_chain(y, gamma, beta, EPS)

    ref = bna._bwd_reference(y, gamma, beta, mean, var, g, EPS)

    # interpret-mode pallas on CPU: route through the real kernel code
    real_call = pl.pallas_call
    import functools as ft

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return real_call(*a, **k)

    bna.pl.pallas_call = interp_call
    try:
        got = bna._bwd_pallas(y, gamma, beta, mean, var, g, EPS)
    finally:
        bna.pl.pallas_call = real_call

    for a, b, tol in zip(ref, got, (2e-2, 1e-3, 1e-3)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=tol, atol=tol)
