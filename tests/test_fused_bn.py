"""Fused-BN train route (models/layers._FusedBNAct + HGR_TPU_FUSED_BN):
the fused two-pass BN(+SiLU) backward wired into ConvBnAct must be a
drop-in for the flax nn.BatchNorm route — same variable tree, same
forward, same running-stat update, same gradients (f32-chain numerics),
for both use_act=True and use_act=False layers. Chip-side cost A/B:
tools/bn_epilogue_ab.py + tools/train_step_slope.py (BENCH_LOG r5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.models import layers
from hgr_tpu.models.layers import ConvBnAct, ResBasicBlock
from hgr_tpu.ops import bn_act_pallas as bna


@pytest.fixture
def route():
    """Toggle the fused route via the documented override, restoring."""

    def set_route(fused: bool):
        layers._FUSED_BN = fused

    yield set_route
    layers._FUSED_BN = None


def _grads_and_out(module, variables, x, fused, route, seed=0):
    route(fused)

    def loss(params):
        (out), mut = module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        # fixed pseudo-cotangent so d(loss)/d(out) is a dense tensor
        ct = jax.random.normal(jax.random.PRNGKey(seed), out.shape)
        return jnp.sum(out.astype(jnp.float32) * ct), mut["batch_stats"]

    (val, stats), grads = jax.value_and_grad(loss, has_aux=True)(
        variables["params"])
    route(None) if fused is None else None
    return val, stats, grads


@pytest.mark.parametrize("use_act", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_convbnact_fused_matches_flax(route, use_act, dtype):
    """Forward, running stats, and grads agree between routes (the fused
    backward is the closed form of the same f32 chain)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 16) * 0.5, dtype)
    mod = ConvBnAct(32, 3, 1, use_act=use_act, dtype=dtype)
    route(False)
    variables = mod.init(jax.random.PRNGKey(1), x, train=True)

    v_a, s_a, g_a = _grads_and_out(mod, variables, x, False, route)
    v_b, s_b, g_b = _grads_and_out(mod, variables, x, True, route)

    # rounding-level disagreement only: flax's fast-variance formula vs
    # the two-pass batch variance, then autodiff vs the closed form —
    # tolerance scales with each leaf's magnitude.
    rtol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(float(v_a), float(v_b), rtol=rtol)
    for a, b in zip(jax.tree_util.tree_leaves(s_a),
                    jax.tree_util.tree_leaves(s_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_b)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        atol = rtol * max(np.max(np.abs(a)), 1.0)
        np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)


def test_variable_tree_identical_across_routes(route):
    """init under either route creates the exact same tree (same paths,
    shapes, values) — checkpoints are route-agnostic."""
    x = jnp.zeros((2, 8, 8, 8), jnp.bfloat16)
    mod = ResBasicBlock(16, dtype=jnp.bfloat16)  # covers act and no-act BNs
    route(False)
    v0 = mod.init(jax.random.PRNGKey(0), x, train=True)
    route(True)
    v1 = mod.init(jax.random.PRNGKey(0), x, train=True)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))
    for a, b in zip(jax.tree_util.tree_leaves(v0),
                    jax.tree_util.tree_leaves(v1)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_reads_fused_trained_stats(route):
    """A step of fused-route training updates batch_stats exactly like
    flax; eval (always the flax route) consumes them unchanged."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(8, 6, 6, 8), jnp.float32)
    mod = ConvBnAct(8, 1, 1, dtype=jnp.float32)
    route(True)
    variables = mod.init(jax.random.PRNGKey(0), x, train=True)
    _, mut = mod.apply(variables, x, train=True, mutable=["batch_stats"])
    route(False)
    out_flax, mut_flax = mod.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(mut),
                    jax.tree_util.tree_leaves(mut_flax)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # eval consumes the trained stats without mutation on either route
    ev = mod.apply({"params": variables["params"],
                    "batch_stats": mut["batch_stats"]}, x, train=False)
    assert ev.shape == out_flax.shape


def test_bn_dtype_knob_overrides_fused(route):
    """HGR_TPU_BN_DTYPE=bfloat16 keeps the flax bf16 chain even when the
    fused route is on (fused == f32-chain numerics by definition)."""
    x = jnp.asarray(np.random.RandomState(3).randn(2, 4, 4, 8),
                    jnp.bfloat16)
    mod = ConvBnAct(8, 1, 1, dtype=jnp.bfloat16)
    route(False)
    variables = mod.init(jax.random.PRNGKey(0), x, train=True)
    route(True)
    layers._BN_DTYPE = jnp.bfloat16
    try:
        out_knob, _ = mod.apply(variables, x, train=True,
                                mutable=["batch_stats"])
        layers._BN_DTYPE = jnp.float32
        out_f32, _ = mod.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    finally:
        layers._BN_DTYPE = None
    # both run; the knob arm must equal the flax bf16-chain output
    route(False)
    layers._BN_DTYPE = jnp.bfloat16
    try:
        out_flax_bf16, _ = mod.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
    finally:
        layers._BN_DTYPE = None
    np.testing.assert_array_equal(np.asarray(out_knob, np.float32),
                                  np.asarray(out_flax_bf16, np.float32))
    assert out_f32.shape == out_knob.shape


@pytest.mark.parametrize("act", [True, False])
def test_bn_act_no_act_backward_matches_autodiff(act):
    """The act=False variant of the fused op (ConvBnAct use_act=False
    layers) against autodiff of the plain chain."""
    rng = np.random.RandomState(4)
    y = jnp.asarray(rng.randn(4, 6, 6, 24), jnp.float32)
    gamma = jnp.asarray(rng.rand(24) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(24) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.randn(4, 6, 6, 24), jnp.float32)

    def plain(y_, g_, b_):
        yf = y_.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(yf - mean), axis=(0, 1, 2))
        z = (yf - mean) * jax.lax.rsqrt(var + 1e-5) * g_ + b_
        z = z * jax.nn.sigmoid(z) if act else z
        return jnp.sum(z * ct)

    def fused(y_, g_, b_):
        out, _, _ = bna.bn_act(y_, g_, b_, 1e-5, act)
        return jnp.sum(out.astype(jnp.float32) * ct)

    gp = jax.grad(plain, argnums=(0, 1, 2))(y, gamma, beta)
    gf = jax.grad(fused, argnums=(0, 1, 2))(y, gamma, beta)
    for a, b in zip(gp, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
