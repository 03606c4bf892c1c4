"""Pallas attention kernel: equality with the XLA path (interpreter mode
on CPU) and gradient correctness through the custom VJP.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.ops import attention_pallas as ap


@pytest.mark.parametrize("n,d", [(145, 32), (65, 32)])
def test_pallas_matches_xla_interpret(n, d):
    """Run the kernel in interpreter mode and compare with XLA."""
    if not ap._HAS_PLTPU:
        pytest.skip("pallas tpu backend unavailable")
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 4, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(2, 4, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(2, 4, n, d), jnp.float32)
    scale = d ** -0.5

    ref_out, ref_attn = ap._xla_attention(q, k, v, scale)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        out, attn = ap._fused_attention_fwd_impl(q, k, v, scale)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ref_attn),
                               rtol=1e-4, atol=1e-6)
    # rows sum to 1 (padding masked out)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)


def test_custom_vjp_matches_xla_grad():
    """The custom backward equals autodiff through the XLA attention.
    On CPU fused_attention falls back to XLA forward, so this isolates
    the hand-written VJP."""
    rng = np.random.RandomState(1)
    n, d = 33, 16
    q = jnp.asarray(rng.randn(1, 2, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, n, d), jnp.float32)
    scale = d ** -0.5

    def loss_fused(q, k, v):
        out, attn = ap.fused_attention(q, k, v, scale)
        return jnp.sum(out ** 2) + jnp.sum(attn[:, :, 0] ** 2)

    def loss_xla(q, k, v):
        out, attn = ap._xla_attention(q, k, v, scale)
        return jnp.sum(out ** 2) + jnp.sum(attn[:, :, 0] ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_model_with_pallas_flag_runs_on_cpu():
    """use_pallas=True falls back to XLA off-TPU but keeps the same
    module structure/params."""
    from hgr_tpu.models import MultiTaskNet

    m1 = MultiTaskNet(image_size=(64, 64), use_pallas=True)
    m2 = MultiTaskNet(image_size=(64, 64), use_pallas=False)
    v1 = m1.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                 train=False)
    v2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                 train=False)
    s1 = jax.tree_util.tree_structure(v1)
    s2 = jax.tree_util.tree_structure(v2)
    assert s1 == s2
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    o1 = m1.apply(v1, x, train=False)
    o2 = m2.apply(v2, x, train=False)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]),
                               atol=1e-5)
