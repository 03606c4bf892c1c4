"""Mesh + sharding-rule machinery.

Design (SURVEY.md §5.8, BASELINE.json config 5): the primary strategy is
DATA parallelism over a 1-D ``('data',)`` mesh — batch sharded over ICI,
parameters replicated, gradient all-reduce compiled in by XLA under jit.
An optional ``('data', 'model')`` mesh additionally TENSOR-parallelizes
the ViT decoder (qkv/MLP hidden dims sharded on 'model') — overkill for a
7.4M-param model but it exercises the full sharding path end-to-end.

BatchNorm note: under jit-with-shardings the BN batch statistics are
computed over the GLOBAL batch (XLA inserts the cross-chip reduction) —
numerically identical to running the reference single-device at the
global batch size, which is the faithful scaling of its recipe.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def resolve_fused_attention(mesh_shape: Dict[str, int],
                            heads: int = 8) -> Any:
    """Attention-routing policy for a mesh spec (vit.Attention.fused).

    Tensor-parallel meshes shard the ViT qkv feature dim on 'model':
    the head-sharded 'split' form keeps the fused Pallas attention
    (each chip computes its local head group,
    ops/attention_pallas.py:fused_attention_split); a model axis that
    does not divide the head count falls back to the GSPMD-shardable
    XLA chain (False). A degenerate ``model=1`` axis is NOT
    tensor-parallel and keeps the packed kernel (True) — the same
    predicate callers use for ``shard_state(..., tensor_parallel=)``.
    """
    tp = mesh_shape.get("model", 1) if mesh_shape else 1
    if tp <= 1:
        return True
    return "split" if heads % tp == 0 else False


def make_mesh(shape: Dict[str, int],
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a mesh, e.g. make_mesh({'data': 8}) or
    make_mesh({'data': 4, 'model': 2})."""
    axis_names = tuple(shape.keys())
    dims = tuple(shape.values())
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(dims))
    if n > len(devices):
        raise ValueError(
            f"mesh {shape} needs {n} devices, have {len(devices)}")
    mesh_devices = mesh_utils.create_device_mesh(
        dims, devices=list(devices)[:n])
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules for the ViT decoder (path regex -> PartitionSpec).
# Megatron-style: qkv/fc1 column-parallel, to_out/fc2 row-parallel; XLA
# inserts the all-reduce after the row-parallel matmul automatically.
TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*transformer.*to_qkv/kernel$", P(None, "model")),
    (r".*transformer.*to_out/kernel$", P("model", None)),
    (r".*transformer.*fc1/kernel$", P(None, "model")),
    (r".*transformer.*fc1/bias$", P("model")),
    (r".*transformer.*fc2/kernel$", P("model", None)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_shardings(
    params: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = (),
) -> Any:
    """Pytree of NamedShardings for a param tree. Unmatched leaves are
    replicated; rules only apply when 'model' is a mesh axis."""
    use_rules = [r for r in rules if all(
        ax is None or ax in mesh.axis_names
        for spec_ax in r[1] for ax in (
            spec_ax if isinstance(spec_ax, tuple) else (spec_ax,)))]

    def assign(path, leaf):
        name = _path_str(path)
        for pattern, spec in use_rules:
            if re.match(pattern, name):
                # Only shard when the dimension divides evenly.
                ok = True
                for dim, ax in zip(leaf.shape, spec):
                    if ax is not None:
                        if dim % mesh.shape[ax] != 0:
                            ok = False
                if ok:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Put a host batch onto the mesh with the batch dim sharded over
    'data'.

    Single-process: a plain device_put with the batch sharding.
    Multi-process (jax.distributed initialized, mesh spans processes):
    each process holds only its LOCAL row-slice of the global batch
    (data.loader.BatchLoader(process_count, process_index)), and the
    leaves are reassembled into global arrays with
    ``jax.make_array_from_process_local_data`` — global row 0..B/N-1 is
    process 0's slice, and so on, matching the loader's contiguous
    slicing so the global batch is bit-identical to the single-process
    one (tests/test_distributed.py).
    """
    sh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    nproc = jax.process_count()
    multiproc = nproc > 1 and any(
        d.process_index != jax.process_index()
        for d in mesh.devices.flat)
    out = {}
    for k, v in batch.items():
        if np.ndim(v) == 0:
            out[k] = jax.device_put(v, rep)
        elif multiproc:
            local = np.asarray(v)
            global_shape = (local.shape[0] * nproc,) + local.shape[1:]
            out[k] = jax.make_array_from_process_local_data(
                sh, local, global_shape)
        else:
            out[k] = jax.device_put(v, sh)
    return out
