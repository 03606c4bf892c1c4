"""The training loop: epochs over staged batches, on-device metrics,
best/last checkpoints, debug-image dumps, final test with confusion matrix.

Orchestration parity with the reference MultiTaskModule/Trainer
(reference train.py:24-240):
  * per-step logging of total/class/joints loss, batch macro-F1 and
    running PCK pose accuracy (train.py:86-107 — but computed on device);
  * val each epoch; best checkpoint on min val total loss, plus last
    (train.py:214-221);
  * debug image grids every ``debug_every`` batches (train.py:148-174);
  * test at the end: epoch macro-F1 print + confusion-matrix PNG
    (train.py:176-187).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hgr_tpu.config import AugmentConfig, DataConfig, ModelConfig, TrainConfig
from hgr_tpu.data.loader import BatchLoader
from hgr_tpu.ops.metrics import macro_f1_from_confusion
from hgr_tpu.train.checkpoint import CheckpointManager
from hgr_tpu.train.logging import MetricLogger
from hgr_tpu.train.state import TrainState
from hgr_tpu.train.steps import (make_eval_step, make_train_step,
                                 resolve_grad_demix)


class EpochMetrics:
    """Host-side accumulator over per-step device metrics."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self) -> None:
        # Accumulators stay as (lazy) device scalars — NO float() until
        # snapshot(), so updating never forces a host sync (unlike the
        # reference's per-step .cpu() metrics, train.py:67-73).
        self.sums: Dict[str, Any] = {}
        self.weight = 0.0  # total valid samples seen
        self.pose_acc_weighted = 0.0
        self.pose_cnt = 0.0
        self.conf = jnp.zeros((self.num_classes, self.num_classes))
        self.loader_wait_s = 0.0  # host time blocked on the loader

    def update(self, metrics: Dict) -> None:
        # Scalar metrics are per-batch masked means; weight by the batch's
        # valid-sample count so a padded tail batch contributes exactly
        # its real samples (the reference never pads — drop_last=False
        # DataLoaders, libs/load.py:289-305 — so this matches its
        # full-split averages).
        w = metrics.get("valid_cnt", 1.0)
        self.weight = self.weight + w
        for k in ("total_loss", "class_loss", "joints_loss", "cls_f1score"):
            self.sums[k] = self.sums.get(k, 0.0) + metrics[k] * w
        cnt = metrics["pose_cnt"]
        # running pose acc mirrors the reference's manual accumulators
        # (train.py:89-90: total_acc += avg_acc * cnt; count += cnt)
        self.pose_acc_weighted = (
            self.pose_acc_weighted + metrics["pose_acc"] * cnt)
        self.pose_cnt = self.pose_cnt + cnt
        self.conf = self.conf + metrics["conf_update"]

    def snapshot(self) -> Dict[str, float]:
        weight = float(self.weight)
        out = {k: float(v) / max(weight, 1.0)
               for k, v in self.sums.items()}
        pose_cnt = float(self.pose_cnt)
        out["pose_acc"] = (
            float(self.pose_acc_weighted) / pose_cnt if pose_cnt else 0.0)
        out["epoch_f1"] = float(macro_f1_from_confusion(self.conf))
        out["samples"] = weight
        out["loader_wait_s"] = self.loader_wait_s
        return out


class NonFiniteLossError(RuntimeError):
    """Raised when the training loss becomes NaN/Inf (basic failure
    detection — the reference has none at all, SURVEY.md §5.3; last/best
    checkpoints on disk enable resume from before the blow-up)."""


def train_epoch(
    state: TrainState,
    step_fn: Callable,
    loader: BatchLoader,
    key: jax.Array,
    metrics: EpochMetrics,
    logger: Optional[MetricLogger] = None,
    log_every: int = 50,
    prefix: str = "train",
    nan_guard_every: int = 50,
    lr_fn: Optional[Callable] = None,
    debug_hook: Optional[Callable] = None,
    debug_every: int = 100,
    profile_steps: int = 0,
    profile_dir: str = "",
) -> TrainState:
    """One epoch. ``lr_fn(step) -> lr`` is logged at every logging line
    (reference LearningRateMonitor, train.py:213); ``debug_hook(state,
    batch, step)`` fires every ``debug_every`` TRAIN batches (reference
    on_train_batch_end debug dumps, train.py:148-160).

    Starvation accounting: time spent blocked on the host loader is
    accumulated into ``metrics.loader_wait_s`` (device work is async —
    if the loader keeps up this stays near zero while the epoch wall
    clock is upload+compute bound)."""
    tracing = False
    it = iter(loader)
    i = 0
    while True:
        t_wait = time.perf_counter()
        batch = next(it, None)
        metrics.loader_wait_s += time.perf_counter() - t_wait
        if batch is None:
            break
        if profile_steps and i == 0:
            # jax.profiler trace over the first ``profile_steps`` steps
            # (SURVEY.md §5.1; view with TensorBoard/xprof)
            jax.profiler.start_trace(profile_dir)
            tracing = True
        key, sub = jax.random.split(key)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, m = step_fn(state, batch, sub)
        if tracing and i + 1 >= profile_steps:
            jnp.asarray(m["total_loss"]).block_until_ready()
            jax.profiler.stop_trace()
            tracing = False
        # Guard at logging cadence so the check doesn't force a sync
        # every step.
        if i % nan_guard_every == 0:
            loss = float(m["total_loss"])
            if not np.isfinite(loss):
                raise NonFiniteLossError(
                    f"non-finite loss {loss} at step {int(state.step)}; "
                    "restore the 'last' checkpoint to resume")
        metrics.update(m)
        if debug_hook is not None and i % debug_every == 0:
            debug_hook(state, batch, int(state.step))
        if i % log_every == 0 and (
                logger is not None or jax.process_count() > 1):
            # Multi-process: EVERY process must build the snapshot at
            # the same cadence — it launches computations over global
            # (all-process) arrays, and only-the-coordinator-running-
            # them desynchronizes the collective streams. The
            # coordinator alone writes the line.
            line = {f"{prefix}/{k}": v
                    for k, v in metrics.snapshot().items()}
            if lr_fn is not None:
                line["lr"] = float(lr_fn(int(state.step)))
            if logger is not None:
                logger.log(int(state.step), line)
        i += 1
    if tracing:  # epoch shorter than profile_steps
        jax.profiler.stop_trace()
    return state


def eval_epoch(
    state: TrainState,
    eval_fn: Callable,
    loader: BatchLoader,
    metrics: EpochMetrics,
) -> Dict[str, float]:
    metrics.reset()
    it = iter(loader)
    while True:
        t_wait = time.perf_counter()
        batch = next(it, None)
        metrics.loader_wait_s += time.perf_counter() - t_wait
        if batch is None:
            break
        m = eval_fn(state, {k: jnp.asarray(v) for k, v in batch.items()})
        metrics.update(m)
    return metrics.snapshot()


def fit(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    data_cfg: DataConfig,
    state: TrainState,
    train_loader: BatchLoader,
    val_loader: BatchLoader,
    test_loader: Optional[BatchLoader] = None,
    save_path: str = "output/run",
    log_dir: str = "logs",
    run_name: str = "run",
    debug_images: bool = False,
    mesh=None,
    tensor_parallel: bool = False,
    lr_fn: Optional[Callable] = None,
    profile_steps: int = 0,
) -> TrainState:
    """Full fit + test (reference train.py:190-240).

    With ``mesh``, the steps jit with explicit shardings (batch on 'data',
    params replicated or ViT tensor-parallel) and every host batch is
    device_put with the batch sharding — the state must already be sharded
    (parallel.steps.shard_state).

    ``debug_images`` dumps GT/pred/heatmap grids every
    ``train_cfg.debug_every`` TRAIN batches and one val batch (with
    attention overlays) per epoch — the reference's cadence
    (train.py:148-174) — mesh-safe (outputs are gathered to host).
    ``lr_fn(step)`` is logged alongside the train metrics (reference
    LearningRateMonitor, train.py:213).
    """
    num_classes = data_cfg.num_classes
    aug = data_cfg.augments

    # Multi-process (parallel.distributed): process 0 owns every side
    # effect — metric logs, checkpoint writes, stdout — while all
    # processes run the identical device program (metrics come out
    # replicated, so every process COULD log; only one should).
    n_proc = jax.process_count()
    is_main = n_proc == 1 or jax.process_index() == 0
    if debug_images and n_proc > 1:
        # debug dumps device_get batch-sharded outputs, which are not
        # fully addressable across processes; the dumps are a debugging
        # aid — run single-process when you need them.
        if is_main:
            print("debug_images disabled under multi-process execution")
        debug_images = False

    step_kw = dict(
        num_classes=num_classes, sigma=train_cfg.sigma,
        image_size=model_cfg.image_size,
        heatmap_size=model_cfg.heatmap_size)
    dbg_step = None
    if mesh is not None:
        from hgr_tpu.parallel.mesh import shard_batch
        from hgr_tpu.parallel.steps import (
            make_parallel_eval_step,
            make_parallel_train_step,
        )

        p_train = make_parallel_train_step(
            mesh, aug, state, tensor_parallel=tensor_parallel,
            class_loss_weight=train_cfg.class_loss_weight,
            grad_accum=train_cfg.grad_accum,
            grad_demix=resolve_grad_demix(train_cfg, model_cfg), **step_kw)
        p_eval = make_parallel_eval_step(
            mesh, state, tensor_parallel=tensor_parallel, **step_kw)

        def train_step(st, batch, key):
            with mesh:
                sb = shard_batch(batch, mesh)
                key = jax.device_put(
                    key, jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec()))
                return p_train(st, sb, key)

        def eval_step(st, batch):
            with mesh:
                return p_eval(st, shard_batch(batch, mesh))

        if debug_images:
            # Two dump steps: train-cadence dumps never render the
            # attention map, so they skip the unfused last layer AND the
            # (B,8,N,N) f32 device→host transfer.
            p_dbg_train = make_parallel_eval_step(
                mesh, state, tensor_parallel=tensor_parallel,
                return_outputs=True, with_attnmap=False, **step_kw)
            p_dbg_val = make_parallel_eval_step(
                mesh, state, tensor_parallel=tensor_parallel,
                return_outputs=True, with_attnmap=True, **step_kw)

            def dbg_step(st, batch, with_attention):
                with mesh:
                    p = p_dbg_val if with_attention else p_dbg_train
                    return p(st, shard_batch(batch, mesh))
    else:
        train_step = make_train_step(
            aug, class_loss_weight=train_cfg.class_loss_weight,
            grad_accum=train_cfg.grad_accum,
            grad_demix=resolve_grad_demix(train_cfg, model_cfg), **step_kw)
        eval_step = make_eval_step(**step_kw)
        if debug_images:
            s_dbg_train = make_eval_step(return_outputs=True,
                                         with_attnmap=False, **step_kw)
            s_dbg_val = make_eval_step(return_outputs=True,
                                       with_attnmap=True, **step_kw)

            def dbg_step(st, batch, with_attention):
                return (s_dbg_val if with_attention else s_dbg_train)(
                    st, batch)

    debug_hook = None
    dump_val_debug = None
    if debug_images:
        from hgr_tpu.utils.vis import save_debug_images

        dbg_dir = os.path.join(save_path, "debug")
        os.makedirs(dbg_dir, exist_ok=True)

        def _dump(st, batch, name, with_attention):
            _, outputs = dbg_step(st, batch, with_attention)
            outputs = jax.device_get(outputs)
            save_debug_images(outputs, os.path.join(dbg_dir, name),
                              with_attention=with_attention)

        def debug_hook(st, batch, step):
            # train dumps carry no attention overlay, like the reference
            # (libs/vis.py:187-205 gates attention on the val prefix).
            _dump(st, batch, f"train_{step}", with_attention=False)

        _val_batch_cache = []

        def dump_val_debug(st, epoch):
            if not _val_batch_cache:
                _val_batch_cache.append({
                    k: jnp.asarray(v)
                    for k, v in next(iter(val_loader)).items()})
            _dump(st, _val_batch_cache[0], f"val_{epoch}",
                  with_attention=True)

    logger = MetricLogger(log_dir, run_name) if is_main else None
    ckpt = CheckpointManager(os.path.join(save_path, "weight"))
    # Record what the checkpoints ARE next to them: GELAN small/large
    # share every param shape except blocks-per-chain and image_size
    # never appears in a param shape, so without this inference surfaces
    # can only guess (infer/weights.py reads it back; structure-based
    # backbone autodetection stays the fallback for bare npz/ckpt files).
    if is_main:
        with open(os.path.join(save_path, "weight", "run_meta.json"),
                  "w") as f:
            json.dump({
                "backbone": model_cfg.backbone,
                "image_size": list(model_cfg.image_size),
                "num_joints": model_cfg.num_joints,
                "num_classes": model_cfg.num_classes,
                "compute_dtype": model_cfg.compute_dtype,
                "decoder_dtype": model_cfg.decoder_dtype,
                # full mixed-precision recipe + resolved demix mode, so
                # a run is reproducible from its metadata (ADVICE r4)
                "early_dtype": model_cfg.early_dtype,
                "early_units": model_cfg.early_units,
                "grad_demix": resolve_grad_demix(train_cfg, model_cfg),
            }, f, indent=2)
    train_metrics = EpochMetrics(num_classes)
    val_metrics = EpochMetrics(num_classes)
    key = jax.random.PRNGKey(train_cfg.seed)

    for epoch in range(train_cfg.epochs):
        t0 = time.time()
        train_metrics.reset()
        key, sub = jax.random.split(key)
        state = train_epoch(state, train_step, train_loader, sub,
                            train_metrics, logger, lr_fn=lr_fn,
                            debug_hook=debug_hook,
                            debug_every=train_cfg.debug_every,
                            profile_steps=profile_steps if epoch == 0 else 0,
                            profile_dir=os.path.join(save_path, "profile"))
        tr = train_metrics.snapshot()

        val = eval_epoch(state, eval_step, val_loader, val_metrics)
        if logger is not None:
            logger.log(int(state.step),
                       {**{f"train/{k}": v for k, v in tr.items()},
                        **{f"val/{k}": v for k, v in val.items()},
                        "epoch": epoch,
                        **({"lr": float(lr_fn(int(state.step)))}
                           if lr_fn is not None else {}),
                        "epoch_time_s": time.time() - t0})

        # val metrics are replicated (out_shardings=P()), so every
        # process computes the SAME best-checkpoint decision — and
        # every process MUST make the calls: orbax saves are collective
        # under multi-process (CheckpointManager._save runs them
        # synchronously there; the primary host does the writing).
        ckpt.save_last(state)
        ckpt.maybe_save_best(state, val["total_loss"])
        if dump_val_debug is not None:
            dump_val_debug(state, epoch)
        if is_main:
            print(f"epoch {epoch}: train_loss={tr['total_loss']:.4f} "
                  f"val_loss={val['total_loss']:.4f} "
                  f"val_f1={val['epoch_f1']:.4f} "
                  f"val_pose_acc={val['pose_acc']:.4f}")

    if test_loader is not None:
        # Multi-process: saves were synchronous collectives on every
        # process, so the writes are globally ordered before this
        # restore (which is itself a collective all processes enter
        # here). Requires save_path on storage all hosts can read
        # (GCS/NFS on real pods; one filesystem in the rehearsal). The
        # has() probe reads that storage — adopt the coordinator's
        # answer so every process takes the same (collective) branch.
        from hgr_tpu.parallel.distributed import coordinator_decision

        use_best = coordinator_decision(ckpt.has("best"))
        best_state = ckpt.restore(state, "best") if use_best else state
        test_metrics = EpochMetrics(num_classes)
        test = eval_epoch(best_state, eval_step, test_loader, test_metrics)
        if is_main:
            print("Test F1 Score: {:.4f}".format(test["epoch_f1"]))
        if logger is not None:
            logger.log(int(state.step),
                       {f"test/{k}": v for k, v in test.items()})
        if is_main:
            _save_confusion_png(
                np.asarray(test_metrics.conf), list(data_cfg.names.keys()),
                os.path.join(save_path, "confusion_matrix.png"))
    ckpt.wait()  # commit any in-flight async checkpoint before returning
    if logger is not None:
        logger.close()
    return state


def _save_confusion_png(conf: np.ndarray, labels, path: str) -> None:
    """Confusion-matrix PNG (reference train.py:180-187)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 10))
        im = ax.imshow(conf, cmap="Blues")
        ax.set_xticks(range(len(labels)))
        ax.set_yticks(range(len(labels)))
        ax.set_xticklabels(labels, rotation=90)
        ax.set_yticklabels(labels)
        ax.set_xlabel("predicted")
        ax.set_ylabel("true")
        for i in range(conf.shape[0]):
            for j in range(conf.shape[1]):
                if conf[i, j] > 0:
                    ax.text(j, i, int(conf[i, j]), ha="center", va="center",
                            fontsize=7)
        fig.colorbar(im)
        plt.tight_layout()
        plt.savefig(path)
        plt.close(fig)
    except Exception:
        np.save(path.replace(".png", ".npy"), conf)
