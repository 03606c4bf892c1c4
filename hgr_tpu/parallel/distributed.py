"""Multi-process (multi-host) execution: DCN-scale data parallelism.

The single-host path shards a batch over ICI via a Mesh built from
``jax.devices()``. On a TPU pod (or multiple hosts), each host runs ONE
copy of this program; ``jax.distributed.initialize`` connects them
through a coordination service, after which ``jax.devices()`` returns
the GLOBAL device list and the exact same Mesh/NamedSharding code
scales across hosts — XLA compiles the gradient all-reduce to ride ICI
within a slice and DCN between slices (the scaling-book recipe: pick a
mesh, annotate shardings, let the compiler insert collectives).

The reference is single-GPU torch (reference train.py:228-240 drives
one pl.Trainer with no DDP/strategy argument), so this subsystem has no
counterpart to port — it is the TPU-native scaling story on top of the
same training step.

Host-data contract: every process feeds its OWN contiguous row-slice of
each global batch (data.loader.BatchLoader(process_count, process_index)
keeps the global shuffle order identical on every process — same seed,
same epoch counter — and materializes only the local rows), and
``parallel.mesh.shard_batch`` reassembles the global device array with
``jax.make_array_from_process_local_data``. Training is then
numerically identical to running one process at the global batch size,
which tests/test_distributed.py pins end to end through the real CLI.

This module is deliberately thin over jax.distributed: the one piece of
local knowledge it adds is the CPU-backend collectives implementation
(gloo) so the SAME flag surface works for virtual-host rehearsal on CPU
(two localhost processes) and for real pods (where the TPU backend's
native collectives take over and the CPU setting is inert).
"""

from __future__ import annotations

from typing import Optional, Tuple


def parse_spec(spec: str) -> Tuple[str, int, int]:
    """Parse ``'host:port,num_processes,process_id'`` (the
    ``cli/train.py --distributed`` flag format)."""
    parts = spec.split(",")
    if len(parts) != 3:
        raise ValueError(
            "--distributed expects 'host:port,num_processes,process_id'"
            f", got {spec!r}")
    addr, nproc, pid = parts[0], int(parts[1]), int(parts[2])
    if not (0 <= pid < nproc):
        raise ValueError(f"process_id {pid} out of range for "
                         f"num_processes {nproc}")
    return addr, nproc, pid


def initialize(coordinator_address: str,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Connect this process to the coordination service.

    Must run before the jax backend initializes (same constraint as
    utils.platform.force_host_cpu — call order in cli/train.py is
    force_host_cpu -> initialize -> first device use). On TPU pods the
    arguments beyond the coordinator can be omitted (auto-detected from
    the TPU metadata); on CPU/GPU all three are required.
    """
    import jax

    # CPU backend cross-process collectives need an explicit transport;
    # gloo ships with jaxlib on Linux. Inert for the TPU backend.
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older jaxlib without the option: TPU-only distributed
    kwargs = {}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(coordinator_address, **kwargs)


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()


def is_coordinator() -> bool:
    """Process 0 owns the side effects every process must not duplicate:
    metric logs, checkpoint writes, debug dumps, stdout."""
    return process_index() == 0


def coordinator_decision(value: bool) -> bool:
    """Adopt the COORDINATOR's boolean on every process.

    Any branch that leads into a collective (orbax save/restore,
    sharded computation) must be taken identically everywhere; when the
    branch condition reads shared storage (``CheckpointManager.has``),
    an eventually-consistent filesystem can make processes disagree.
    Single-process: returns ``value`` unchanged.
    """
    import jax

    if jax.process_count() == 1:
        return value
    import numpy as np
    from jax.experimental import multihost_utils

    return bool(multihost_utils.broadcast_one_to_all(np.int32(value)))


def barrier(name: str = "hgr_barrier") -> None:
    """Block until every process reaches this point (a psum over all
    global devices under the hood). Used to order checkpoint WRITES
    (coordinator) before checkpoint READS (everyone) — the checkpoint
    directory must live on storage all hosts can read."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
