"""Fused no-map attention core (ops/attention_pallas.py).

Parity with the unfused XLA chain (reference model/transformer.py:62-77
semantics: f32 softmax, compute-dtype value matmul), gradient path, and
the model-level need_attnmap plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.models import MultiTaskNet
from hgr_tpu.ops.attention_pallas import (
    _xla_attention_core,
    fused_attention_qkv,
    merge_heads,
    split_heads,
)

B, H, N, D = 3, 8, 145, 32
SCALE = D**-0.5


def _qkv(dtype=jnp.float32, seed=0, b=B, n=N):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(b, n, 3 * H * D), dtype)


def _reference(qkv):
    q, k, v = split_heads(qkv, H, D)
    return merge_heads(_xla_attention_core(q, k, v, SCALE))


def test_kernel_matches_xla_core_interpret_f32():
    qkv = _qkv()
    got = fused_attention_qkv(qkv, H, D, SCALE, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_reference(qkv)),
                               atol=1e-5, rtol=1e-5)


def test_kernel_matches_xla_core_interpret_bf16():
    qkv = _qkv(jnp.bfloat16)
    got = fused_attention_qkv(qkv, H, D, SCALE, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(_reference(qkv), np.float32), atol=2e-2)


def test_kernel_other_seq_len():
    """The kernel is generic over N (non-multiple-of-8 included)."""
    qkv = _qkv(seed=1, b=2, n=37)
    got = fused_attention_qkv(qkv, H, D, SCALE, True)
    q, k, v = split_heads(qkv, H, D)
    want = merge_heads(_xla_attention_core(q, k, v, SCALE))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_custom_vjp_matches_xla_grads():
    """The recompute-bwd must equal differentiating the unfused chain."""
    qkv = _qkv(seed=2)

    def loss_fused(qkv):
        return jnp.sum(jnp.sin(fused_attention_qkv(qkv, H, D, SCALE)))

    def loss_xla(qkv):
        return jnp.sum(jnp.sin(_reference(qkv)))

    g_f = jax.grad(loss_fused)(qkv)
    g_x = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               atol=1e-4, rtol=1e-4)


@pytest.fixture(scope="module")
def model_and_vars():
    model = MultiTaskNet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 192, 192, 3)), train=False)
    return model, variables


def test_model_need_attnmap_false_same_outputs(model_and_vars):
    """need_attnmap=False returns identical logits/heatmaps and a None
    third output (on CPU both routes share the XLA core; the TPU A/B
    lives in BENCH_LOG.md round 2b)."""
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(2).randn(2, 192, 192, 3),
                    jnp.float32)
    c1, h1, a1 = model.apply(variables, x, train=False)
    c2, h2, a2 = model.apply(variables, x, train=False,
                             need_attnmap=False)
    assert a1 is not None and a1.shape == (2, 8, 145, 145)
    assert a2 is None
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               atol=1e-6)


def test_custom_vjp_kernel_interpret_matches_xla_grads():
    """interpret=True drives BOTH pallas kernels (fwd + bwd) through the
    interpreter; gradients must equal differentiating the XLA chain."""
    qkv = _qkv(seed=3)

    def loss_fused(qkv):
        return jnp.sum(jnp.sin(fused_attention_qkv(qkv, H, D, SCALE, True)))

    def loss_xla(qkv):
        return jnp.sum(jnp.sin(_reference(qkv)))

    g_f = jax.grad(loss_fused)(qkv)
    g_x = jax.grad(loss_xla)(qkv)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               atol=1e-4, rtol=1e-4)


def test_model_fused_attention_flag_plumbs(model_and_vars):
    """fused_attention=False (the tensor-parallel routing,
    vit.Attention.fused) must accept the same params and produce the
    same outputs as the default model on the XLA path."""
    model, variables = model_and_vars
    model_tp = MultiTaskNet(fused_attention=False)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 192, 192, 3),
                    jnp.float32)
    c1, h1, _ = model.apply(variables, x, train=False, need_attnmap=False)
    c2, h2, a2 = model_tp.apply(variables, x, train=False,
                                need_attnmap=False)
    assert a2 is None
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
