"""Sharded train/eval steps: jit over a Mesh with explicit shardings.

The SAME step logic as hgr_tpu.train.steps runs under a mesh: batch
sharded on 'data', params replicated (or ViT tensor-parallel via
TP_RULES). XLA compiles the gradient all-reduce (and TP collectives)
onto ICI — the TPU-native replacement for the DDP/NCCL machinery the
reference never had (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh

from hgr_tpu.config import AugmentConfig
from hgr_tpu.parallel.mesh import (
    TP_RULES,
    batch_sharding,
    param_shardings,
    replicated_sharding,
)
from hgr_tpu.train.state import TrainState
from hgr_tpu.train import steps as base_steps


def state_shardings(state: TrainState, mesh: Mesh,
                    tensor_parallel: bool = False) -> TrainState:
    """Sharding pytree matching a TrainState."""
    rules = TP_RULES if tensor_parallel else ()
    p_sh = param_shardings(state.params, mesh, rules)
    rep = replicated_sharding(mesh)

    def like_params(tree):
        # optimizer moments share the param tree structure; scalars and
        # anything that isn't param-shaped replicates.
        flat_p, treedef_p = jax.tree_util.tree_flatten(state.params)
        try:
            flat_t, treedef_t = jax.tree_util.tree_flatten(tree)
            if treedef_t == treedef_p:
                return jax.tree_util.tree_unflatten(
                    treedef_p, jax.tree_util.tree_leaves(p_sh))
        except Exception:
            pass
        return jax.tree_util.tree_map(lambda _: rep, tree)

    opt_sh = jax.tree_util.tree_map(
        like_params, state.opt_state,
        is_leaf=lambda x: jax.tree_util.tree_structure(x)
        == jax.tree_util.tree_structure(state.params))
    return state.replace(
        step=rep,
        params=p_sh,
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        opt_state=opt_sh,
    )


def shard_state(state: TrainState, mesh: Mesh,
                tensor_parallel: bool = False) -> TrainState:
    """device_put a host TrainState onto the mesh with its shardings."""
    sh = state_shardings(state, mesh, tensor_parallel)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, sh)


def make_parallel_train_step(
    mesh: Mesh,
    aug_cfg: AugmentConfig,
    state_template: TrainState,
    num_classes: int = 19,
    sigma: float = 2.0,
    image_size=(192, 192),
    heatmap_size=(48, 48),
    tensor_parallel: bool = False,
    class_loss_weight: float = 0.001,  # reference train.py:63
    grad_accum: int = 1,
    grad_demix: bool = False,
) -> Callable:
    """Jit the train step with explicit in/out shardings over ``mesh``.

    Returned step(state, batch, key): batch leaves with a leading batch
    dim must be sharded on 'data' (use parallel.mesh.shard_batch).

    ``grad_accum > 1`` composes with the mesh: each scan microbatch is a
    contiguous B/N row slice which GSPMD reshards over 'data' (an ICI
    all-to-all on one microbatch's canvases — sub-ms next to the
    microbatch's compute); gradients recombine exactly as in the
    single-device path (train/steps.py).
    """
    inner = base_steps.make_train_step(
        aug_cfg, num_classes=num_classes, sigma=sigma,
        image_size=image_size, heatmap_size=heatmap_size, donate=False,
        class_loss_weight=class_loss_weight, grad_accum=grad_accum,
        grad_demix=grad_demix)
    # Reuse the un-jitted logic: make_train_step returns a jitted fn; get
    # its wrapped function to avoid nested jit dispatch overhead.
    fn = inner.__wrapped__ if hasattr(inner, "__wrapped__") else inner

    st_sh = state_shardings(state_template, mesh, tensor_parallel)
    # b_sh / rep act as PYTREE PREFIXES: every batch leaf (all batch-led)
    # shards on 'data'; every metric scalar/matrix replicates.
    b_sh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    return jax.jit(
        fn,
        in_shardings=(st_sh, b_sh, rep),
        out_shardings=(st_sh, rep),
        donate_argnums=(0,),
    )


def make_parallel_eval_step(
    mesh: Mesh,
    state_template: TrainState,
    num_classes: int = 19,
    sigma: float = 2.0,
    image_size=(192, 192),
    heatmap_size=(48, 48),
    tensor_parallel: bool = False,
    return_outputs: bool = False,
    with_attnmap: bool = None,
) -> Callable:
    inner = base_steps.make_eval_step(
        num_classes=num_classes, sigma=sigma, image_size=image_size,
        heatmap_size=heatmap_size, return_outputs=return_outputs,
        with_attnmap=with_attnmap)
    fn = inner.__wrapped__ if hasattr(inner, "__wrapped__") else inner
    st_sh = state_shardings(state_template, mesh, tensor_parallel)
    b_sh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    if return_outputs:
        # metrics replicate; every outputs leaf is batch-led
        # (image/target/.../attnmap) — sharded on 'data'; the debug
        # dumper device_gets the gather (prefix shardings).
        return jax.jit(
            fn,
            in_shardings=(st_sh, b_sh),
            out_shardings=(rep, b_sh),
        )
    return jax.jit(
        fn,
        in_shardings=(st_sh, b_sh),
        out_shardings=rep,
    )
