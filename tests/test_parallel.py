"""Multi-chip tests on the 8-device virtual CPU mesh: data-parallel and
data+tensor-parallel sharded train steps match the single-device step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.config import AugmentConfig
from hgr_tpu.models import MultiTaskNet
from hgr_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    shard_batch,
    TP_RULES,
)
from hgr_tpu.parallel.steps import (
    make_parallel_train_step,
    shard_state,
    state_shardings,
)
from hgr_tpu.train.state import create_train_state
from hgr_tpu.train.steps import make_train_step

IMAGE = 64
CANVAS = 96
HI = jax.lax.Precision.HIGHEST


def _host_batch(batch):
    rng = np.random.RandomState(0)
    return {
        "canvas": rng.randint(0, 255, (batch, CANVAS, CANVAS, 3)).astype(
            np.uint8),
        "orig_to_canvas": np.tile(
            np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
            (batch, 1, 1)),
        "sizes_hw": np.full((batch, 2), float(CANVAS), np.float32),
        "joints": (rng.rand(batch, 21, 2) * CANVAS).astype(np.float32),
        "joints_vis": np.ones((batch, 21), np.float32),
        "label": rng.randint(0, 19, (batch,)).astype(np.int32),
    }


def _tiny_state(rng_seed=0):
    model = MultiTaskNet(image_size=(IMAGE, IMAGE), precision=HI)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(rng_seed), (1, IMAGE, IMAGE, 3),
        lr=1e-3, milestones_steps=(1000,))
    return state


STEP_KW = dict(image_size=(IMAGE, IMAGE), heatmap_size=(IMAGE // 4,
                                                        IMAGE // 4))


def test_make_mesh_shapes():
    mesh = make_mesh({"data": 8})
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh({"data": 4, "model": 2})
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 16})


def test_param_shardings_tp_rules():
    mesh = make_mesh({"data": 4, "model": 2})
    state = _tiny_state()
    sh = param_shardings(state.params, mesh, TP_RULES)
    qkv = sh["decoder"]["transformer"]["layers_0_attn"]["to_qkv"]["kernel"]
    assert qkv.spec == jax.sharding.PartitionSpec(None, "model")
    conv = sh["encoder"]["conv1"]["conv"]["kernel"]
    assert conv.spec == jax.sharding.PartitionSpec()


def test_dp_step_matches_single_device():
    """The sharded DP step produces the same loss/update as local jit."""
    aug = AugmentConfig()
    batch = 8
    host = _host_batch(batch)
    key = jax.random.PRNGKey(7)

    # single-device baseline
    state1 = _tiny_state()
    step1 = make_train_step(aug, **STEP_KW)
    state1, m1 = step1(state1, {k: jnp.asarray(v) for k, v in host.items()},
                       key)

    # 8-way data parallel
    mesh = make_mesh({"data": 8})
    state2 = shard_state(_tiny_state(), mesh)
    step2 = make_parallel_train_step(mesh, aug, state2, **STEP_KW)
    with mesh:
        sharded = shard_batch(host, mesh)
        key_r = jax.device_put(
            key, jax.sharding.NamedSharding(mesh,
                                            jax.sharding.PartitionSpec()))
        state2, m2 = step2(state2, sharded, key_r)

    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=2e-4)
    np.testing.assert_allclose(
        float(m1["pose_acc"]), float(m2["pose_acc"]), rtol=1e-4)
    # params after one update agree
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-5)


def test_dp_tp_step_runs_and_matches():
    aug = AugmentConfig()
    host = _host_batch(8)
    key = jax.random.PRNGKey(3)

    state1 = _tiny_state()
    step1 = make_train_step(aug, **STEP_KW)
    _, m1 = step1(state1, {k: jnp.asarray(v) for k, v in host.items()}, key)

    mesh = make_mesh({"data": 4, "model": 2})
    state2 = shard_state(_tiny_state(), mesh, tensor_parallel=True)
    step2 = make_parallel_train_step(
        mesh, aug, state2, tensor_parallel=True, **STEP_KW)
    with mesh:
        sharded = shard_batch(host, mesh)
        key_r = jax.device_put(
            key, jax.sharding.NamedSharding(mesh,
                                            jax.sharding.PartitionSpec()))
        state2, m2 = step2(state2, sharded, key_r)
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=2e-4)
    # TP actually sharded the qkv kernel
    qkv = state2.params["decoder"]["transformer"]["layers_0_attn"]["to_qkv"][
        "kernel"]
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")
