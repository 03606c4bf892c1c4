"""De-mixed task-gradient pullbacks (train/steps.make_train_step
grad_demix) — the round-4 fix for bf16 drowning the CE-x-0.001
classification gradient in the merged cotangent stream (reference loss
composition train.py:63-64; BENCH_LOG round 4 for the bisection)."""

import numpy as np

import jax
import jax.numpy as jnp

from hgr_tpu.config import AugmentConfig, ModelConfig, TrainConfig
from hgr_tpu.models import MultiTaskNet
from hgr_tpu.train.state import create_train_state
from hgr_tpu.train.steps import make_train_step, resolve_grad_demix

IMAGE = 64


def _batch(b=4, canvas=96, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "canvas": jnp.asarray(rng.randint(0, 255, (b, canvas, canvas, 3)),
                              jnp.uint8),
        "orig_to_canvas": jnp.tile(
            jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (b, 1, 1)),
        "sizes_hw": jnp.full((b, 2), float(canvas)),
        "joints": jnp.asarray(rng.rand(b, 21, 2) * canvas, jnp.float32),
        "joints_vis": jnp.ones((b, 21)),
        "label": jnp.asarray(rng.randint(0, 19, (b,)), jnp.int32),
    }


def _grads(dtype, demix):
    model = MultiTaskNet(image_size=(IMAGE, IMAGE), dtype=dtype)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(42), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(100,))
    step = make_train_step(AugmentConfig(), image_size=(IMAGE, IMAGE),
                           heatmap_size=(IMAGE // 4, IMAGE // 4),
                           donate=False, grad_demix=demix,
                           debug_return_grads=True)
    _, m = step(state, _batch(), jax.random.PRNGKey(7))
    return m.pop("_grads"), m


def test_demix_matches_plain_in_f32():
    """In f32 the pullback split is pure reassociation — gradients agree
    to float noise and the metrics are identical quantities."""
    g0, m0 = _grads(jnp.float32, False)
    g1, m1 = _grads(jnp.float32, True)
    np.testing.assert_allclose(float(m0["total_loss"]),
                               float(m1["total_loss"]), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        na = float(jnp.linalg.norm(a))
        nb = float(jnp.linalg.norm(b - a))
        assert nb <= 1e-5 * max(na, 1e-6), (na, nb)


def test_demix_decomposition_consistent_under_bf16():
    """The de-mixed combination g_joints + w*g_ce reproduces the merged
    bf16 backward's gradient up to bf16 reprojection noise (linearity of
    the pullback), and each component is finite and non-degenerate. The
    training-level effect of the knob is pinned on the real chip
    (BENCH_LOG round 4 head-to-head arms), not at unit scale — at unit
    scale both backwards agree; what differs in production is how the
    tiny CE component survives the full-depth recipe."""
    g_plain, m_plain = _grads(jnp.bfloat16, False)
    g_demix, m_demix = _grads(jnp.bfloat16, True)
    np.testing.assert_allclose(float(m_plain["total_loss"]),
                               float(m_demix["total_loss"]), rtol=2e-2)
    num = den = dd = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_demix)):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        assert bool(jnp.all(jnp.isfinite(b)))
        num += float(jnp.vdot(a, b))
        den += float(jnp.vdot(a, a))
        dd += float(jnp.vdot(b, b))
    cos = num / (den ** 0.5 * dd ** 0.5)
    assert cos > 0.99, cos  # same gradient direction
    assert 0.5 < (dd / den) ** 0.5 < 2.0  # same scale


def test_demix_composes_with_grad_accum():
    g1, m1 = None, None
    model = MultiTaskNet(image_size=(IMAGE, IMAGE), dtype=jnp.bfloat16)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(42), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(100,))
    for accum in (1, 2):
        step = make_train_step(AugmentConfig(), image_size=(IMAGE, IMAGE),
                               heatmap_size=(IMAGE // 4, IMAGE // 4),
                               donate=False, grad_demix=True,
                               grad_accum=accum)
        _, m = step(state, _batch(b=4), jax.random.PRNGKey(7))
        assert np.isfinite(float(m["total_loss"]))


def test_resolve_grad_demix_modes():
    # 'auto' = on under any bf16 segment of the shared path — the
    # correctness-first default backed by the round-4 5-seed A/B
    t_auto = TrainConfig(grad_demix="auto")
    assert resolve_grad_demix(t_auto, ModelConfig(compute_dtype="bfloat16"))
    assert resolve_grad_demix(
        t_auto, ModelConfig(compute_dtype="float32",
                            decoder_dtype="bfloat16"))
    assert not resolve_grad_demix(
        t_auto, ModelConfig(compute_dtype="float32"))
    assert resolve_grad_demix(TrainConfig(grad_demix="on"), ModelConfig())
    assert not resolve_grad_demix(
        TrainConfig(grad_demix="off"),
        ModelConfig(compute_dtype="bfloat16"))
