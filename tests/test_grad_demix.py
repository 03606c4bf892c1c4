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


def test_batched_demix_matches_two_pullbacks():
    """'batched' evaluates the same two pullbacks as one batch-2
    backward — gradients must match the two-pullback form to float
    noise in both dtypes (identical math, batched evaluation). f32 is
    the exactness proof (1e-5); bf16 rows round differently through
    batched reduce orders, so its bound is bf16-reprojection scale."""
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 3e-2)):
        g0, m0 = _grads(dtype, True)
        g1, m1 = _grads(dtype, "batched")
        np.testing.assert_allclose(float(m0["total_loss"]),
                                   float(m1["total_loss"]), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            na = float(jnp.linalg.norm(a))
            nb = float(jnp.linalg.norm(b - a))
            assert nb <= tol * max(na, 1e-6), (dtype, na, nb)


def test_batched_demix_composes_with_grad_accum_and_mesh():
    """batched demix under grad_accum and under an 8-way DP mesh."""
    from hgr_tpu.parallel.mesh import make_mesh, shard_batch
    from hgr_tpu.parallel.steps import (make_parallel_train_step,
                                        shard_state)

    model = MultiTaskNet(image_size=(IMAGE, IMAGE))
    state, _ = create_train_state(
        model, jax.random.PRNGKey(42), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(100,))
    astep = make_train_step(AugmentConfig(), image_size=(IMAGE, IMAGE),
                            heatmap_size=(IMAGE // 4, IMAGE // 4),
                            donate=False, grad_demix="batched",
                            grad_accum=2)
    _, ma = astep(state, _batch(b=8), jax.random.PRNGKey(7))
    assert np.isfinite(float(ma["total_loss"]))

    # mesh arm compares like-for-like: accum=1 both sides (grad_accum
    # splits the augment key per microbatch, so its loss differs)
    step = make_train_step(AugmentConfig(), image_size=(IMAGE, IMAGE),
                           heatmap_size=(IMAGE // 4, IMAGE // 4),
                           donate=False, grad_demix="batched")
    _, m = step(state, _batch(b=8), jax.random.PRNGKey(7))

    mesh = make_mesh({"data": 8})
    state2 = shard_state(state, mesh)
    pstep = make_parallel_train_step(
        mesh, AugmentConfig(), state2, image_size=(IMAGE, IMAGE),
        heatmap_size=(IMAGE // 4, IMAGE // 4), grad_demix="batched")
    with mesh:
        sb = shard_batch({k: np.asarray(v)
                          for k, v in _batch(b=8).items()}, mesh)
        key = jax.device_put(
            jax.random.PRNGKey(7),
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        _, m2 = pstep(state2, sb, key)
    np.testing.assert_allclose(float(m["total_loss"]),
                               float(m2["total_loss"]), rtol=2e-4)


def test_resolve_grad_demix_batched_mode():
    assert resolve_grad_demix(
        TrainConfig(grad_demix="batched"), ModelConfig()) == "batched"
