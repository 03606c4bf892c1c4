"""Orbax checkpointing: best-by-monitored-scalar + last.

Policy parity with the reference's Lightning ModelCheckpoint
(reference train.py:214-221: monitor 'val/total_loss', mode min,
save_top_k=1, save_last). Unlike the reference (weights_only=True), we
persist optimizer state and step too, enabling true resume (SURVEY.md
§5.4 calls this out as a reference gap).
"""

from __future__ import annotations

import os
from typing import Optional



def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """best/ + last/ checkpoints under ``directory``."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # Seed 'best' from disk so a --resume run can't overwrite the
        # historical best checkpoint with a worse first epoch.
        self._best_metric: Optional[float] = None
        best_file = os.path.join(self.directory, "best_metric.txt")
        # Trust the recorded metric only if the checkpoint it describes
        # actually committed (an async save interrupted mid-flight leaves
        # the txt without the dir; a stale metric would then block saving
        # a genuinely-best checkpoint forever).
        if not os.path.isdir(os.path.join(self.directory, "best")):
            best_file = ""
        if best_file and os.path.exists(best_file):
            try:
                with open(best_file) as f:
                    self._best_metric = float(f.read().strip())
            except (OSError, ValueError):
                pass
        self._sync_best_metric()
        self._ckptr = _ocp().StandardCheckpointer()

    def _sync_best_metric(self) -> None:
        """Multi-process: adopt the COORDINATOR's seeded best metric on
        every process. The sidecar best_metric.txt lives on shared
        storage; on an eventually-consistent filesystem (GCS) a
        non-coordinator can read a stale value, and since saving 'best'
        is a COLLECTIVE (see _save), processes disagreeing on whether
        the metric improved would desynchronize the collective streams.
        Every construction site runs at the same program point on all
        processes (fit start / CLI resume), so the broadcast is safe.
        """
        import jax

        if jax.process_count() == 1:
            return
        import numpy as np
        from jax.experimental import multihost_utils

        local = np.float64(
            np.nan if self._best_metric is None else self._best_metric)
        synced = float(multihost_utils.broadcast_one_to_all(local))
        self._best_metric = None if np.isnan(synced) else synced

    def _save(self, name: str, state) -> None:
        import threading

        import jax

        path = os.path.join(self.directory, name)
        payload = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        # ASYNC WRITE: snapshot device arrays to host EAGERLY (safe
        # against the next train step donating the buffers), then run
        # the orbax save+wait on a background thread — the epoch loop
        # overlaps the disk write with device compute instead of
        # stalling (the 100k rehearsal's worst epoch was 75 s vs 34 s
        # steady, all checkpoint-write stall). The thread owns the
        # proven synchronous orbax pattern; serialization between saves
        # is by joining the previous writer first. (Orbax's own
        # fire-and-forget async path raced its background commit loop
        # with foreground work on this version — 'cannot schedule new
        # futures after shutdown'.)
        payload = jax.device_get(payload)
        self.wait()

        def commit():
            self._ckptr.save(path, payload, force=True)
            self._ckptr.wait_until_finished()

        if jax.process_count() > 1:
            # Multi-process: orbax's save IS a collective (it runs
            # sync_global_processes barriers internally), so EVERY
            # process must call it, from the MAIN thread, at the same
            # program point — a coordinator-only or background-thread
            # save interleaves orbax's barrier with the other
            # processes' train-step collectives and the gloo/ICI
            # streams desynchronize (observed: gloo EnforceNotMet size
            # mismatch). Synchronous save; the primary host writes the
            # (replicated, host-numpy) payload, the rest participate
            # in the barriers only.
            commit()
            return

        self._writer = threading.Thread(
            target=commit, name=f"ckpt-write-{name}")
        self._writer.start()

    def wait(self) -> None:
        """Block until any in-flight background save has committed."""
        w = getattr(self, "_writer", None)
        if w is not None:
            w.join()
            self._writer = None

    def save_last(self, state) -> None:
        self._save("last", state)

    def maybe_save_best(self, state, monitored: float) -> bool:
        """Save as best when ``monitored`` improves (min mode). Returns
        whether a save happened."""
        if self._best_metric is None or monitored < self._best_metric:
            self._best_metric = float(monitored)
            self._save("best", state)
            import jax

            # Multi-process: the improvement decision is replicated
            # (metrics come out of the step with P() sharding) so every
            # process takes this branch in lockstep, but only the
            # coordinator touches the sidecar file.
            if jax.process_index() == 0:
                with open(os.path.join(self.directory, "best_metric.txt"),
                          "w") as f:
                    f.write(str(self._best_metric))
            return True
        return False

    def restore(self, state, name: str = "last"):
        """Restore into a template TrainState (returns a new state)."""
        self.wait()
        path = os.path.join(self.directory, name)
        template = {
            "step": state.step,
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._ckptr.restore(path, template)
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )

    def has(self, name: str) -> bool:
        self.wait()  # an in-flight write must count (fit checks has()
        # immediately after the last epoch's saves)
        return os.path.isdir(os.path.join(self.directory, name))
