"""Batch-dimension SPMD partitioning for the Pallas kernels.

GSPMD cannot partition a Mosaic custom call on its own: under a
``jit(..., in_shardings=...)`` mesh program (parallel/steps.py) a bare
``pallas_call`` would force a gather/replication of its operands — or
fail — on real multi-chip hardware. The virtual-CPU mesh tests never
caught this because the CPU path takes the XLA fallbacks.

``batch_partitioned`` wraps a kernel-launching impl whose every operand
and result is leading-batch-dim–indexed, declaring the only legal
layout: shard dim 0 along whatever mesh axes the first operand's dim 0
already uses, replicate every other dim, and lower by running the SAME
impl on the per-device shard (data-parallel by construction — the
kernels have no cross-batch dependencies).

Used by ops/attention_pallas.py and ops/warp_pallas.py whenever the
process has more than one device; single-device processes call the impl
directly (identical lowering, no partitioner involvement).
"""

from __future__ import annotations

import os
from collections import Counter
from typing import Callable

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

# How many times each custom_partitioning callback actually fired, keyed
# by '<rule>.<callback>'. The partitioner only invokes these during
# lowering of a mesh-sharded jit — a drive that claims "the kernels went
# through GSPMD partitioning" can (and should) assert these moved
# (tools/sharded_onechip.py does).
CALLBACK_COUNTS: Counter = Counter()


def _batch_axes(arg_shapes):
    """The mesh axes the operands' leading dim is sharded on.

    Checks EVERY operand and keeps the first non-replicated dim-0
    sharding: GSPMD routinely replicates tiny operands (e.g. the warp
    kernel's (B, 10) params) while the big batch operand is sharded —
    deriving from operand 0 alone would then force an all-gather of the
    multi-GB batch onto every device."""
    for a in arg_shapes:
        spec = getattr(a.sharding, "spec", None)
        if spec is not None and len(spec) > 0 and spec[0] is not None:
            return spec[0]
    return None


def batch_partitioned(impl: Callable, sharding_rule: str = None) -> Callable:
    """Wrap ``impl(*arrays) -> array`` (all leading-dim batch) with
    batch-only custom partitioning.

    ``sharding_rule`` is the einsum-style factor rule the Shardy
    partitioner requires (e.g. ``'b n f -> b n g'``); shared factor
    ``b`` carries the batch sharding, every other factor is unique so
    nothing else propagates. The GSPMD callbacks below cover the
    non-Shardy path.
    """
    cp = custom_partitioning(impl)

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        CALLBACK_COUNTS["batch.infer"] += 1
        b = _batch_axes(arg_shapes)
        return NamedSharding(
            mesh, P(b, *([None] * (len(result_shape.shape) - 1))))

    def partition(mesh, arg_shapes, result_shape):
        CALLBACK_COUNTS["batch.partition"] += 1
        b = _batch_axes(arg_shapes)
        arg_shardings = tuple(
            NamedSharding(mesh, P(b, *([None] * (len(a.shape) - 1))))
            for a in arg_shapes)
        result_sharding = NamedSharding(
            mesh, P(b, *([None] * (len(result_shape.shape) - 1))))
        return mesh, impl, result_sharding, arg_shardings

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=sharding_rule)
    return cp


def _dim_axes(arg_shapes, dim: int):
    """The mesh axes any operand's dimension ``dim`` is sharded on
    (first non-replicated wins — same rationale as ``_batch_axes``)."""
    for a in arg_shapes:
        spec = getattr(a.sharding, "spec", None)
        if spec is not None and len(spec) > dim and spec[dim] is not None:
            return spec[dim]
    return None


def _axes_size(mesh, axes) -> int:
    if axes is None:
        return 1
    if not isinstance(axes, tuple):
        axes = (axes,)
    size = 1
    for ax in axes:
        size *= mesh.shape[ax]
    return size


def head_partitioned(full_impl: Callable, make_local: Callable[[int], Callable],
                     heads: int, head_dim: int,
                     sharding_rule: str = None) -> Callable:
    """Head-AND-batch partitioning for the split-operand attention
    kernels (tensor-parallel meshes).

    Every operand and result is rank-3 ``(B, N, H·D)`` (or ``H·D``-sized
    gradients thereof): dim 0 is batch (sharded over the data axes), dim
    1 is the token dim (replicated), dim 2 is the packed per-head
    feature dim. Under Megatron-style TP the feature dim is contiguously
    sharded over the 'model' axis, and because ``H·D / tp`` stays a
    whole number of heads, each device's shard is a complete head group
    — attention has no cross-head math, so the lowering is simply
    ``make_local(heads // tp)`` run on the local shard. Batch sharding
    composes freely (DP×TP meshes).

    ``full_impl`` (all heads) is what traces for abstract evaluation and
    what runs when the partitioner is not engaged.
    """
    cp = custom_partitioning(full_impl)

    def _shardings(mesh, arg_shapes, result_shape):
        b = _dim_axes(arg_shapes, 0)
        m = _dim_axes(arg_shapes, 2)
        sh = NamedSharding(mesh, P(b, None, m))
        many = isinstance(result_shape, (list, tuple))
        results = tuple(sh for _ in result_shape) if many else sh
        return b, m, sh, results

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        CALLBACK_COUNTS["head.infer"] += 1
        return _shardings(mesh, arg_shapes, result_shape)[3]

    def partition(mesh, arg_shapes, result_shape):
        CALLBACK_COUNTS["head.partition"] += 1
        b, m, sh, results = _shardings(mesh, arg_shapes, result_shape)
        tp = _axes_size(mesh, m)
        if heads % tp != 0:
            raise ValueError(
                f"head-partitioned attention: {heads} heads do not divide "
                f"over a model axis of size {tp}; build the model with "
                f"fused_attention=False for this mesh")
        local = make_local(heads // tp)
        arg_shardings = tuple(sh for _ in arg_shapes)
        return mesh, local, results, arg_shardings

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=sharding_rule)
    return cp


def multi_device() -> bool:
    """True when SPMD partitioning can apply (more than one device).

    ``HGR_TPU_FORCE_PARTITIONED=1`` overrides to True: on a 1-device
    mesh the kernels would otherwise take their direct-impl branch and
    the custom_partitioning wrappers never enter the graph at all —
    which means a single-chip "sharded" drive exercises GSPMD but NOT
    these rules. The override exists so tools/sharded_onechip.py can
    route the real compiler through the wrappers (and assert via
    CALLBACK_COUNTS whether the partitioner actually invoked them).
    """
    if os.environ.get("HGR_TPU_FORCE_PARTITIONED") == "1":
        return True
    return jax.device_count() > 1
