"""Multi-chip scaling: mesh construction + sharding rules + sharded steps.

The reference trains on ONE pinned GPU (reference train.py:228-229) with
no distributed backend at all (SURVEY.md §2c). Here scaling is first-class
and TPU-native: a `jax.sharding.Mesh` over ICI, `NamedSharding` pytrees,
and jit-compiled collectives — no NCCL analog to manage.
"""

from hgr_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
)
from hgr_tpu.parallel.steps import make_parallel_train_step  # noqa: F401
from hgr_tpu.parallel import distributed  # noqa: F401
