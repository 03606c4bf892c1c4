"""Training CLI — flag surface mirrors the reference (train.py:244-283)
plus TPU-native extensions (--dtype, --mesh, --canvas_size).

Example:
  python cli/train.py --data_config configs/hagrid.yaml --suffix run1 \
      --batch_size 32 --epochs 50 --lr 1e-3
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('--data_config', type=str, required=True,
                        help='path to the data config')
    parser.add_argument('--suffix', type=str, default='run',
                        help='suffix of the model name')
    parser.add_argument('--backbone', type=str, default='gelans',
                        choices=['gelans', 'gelanl'],
                        help='GELAN backbone variant')
    parser.add_argument('--batch_size', type=int, default=32)
    parser.add_argument('--epochs', type=int, default=50)
    parser.add_argument('--lr', type=float, default=0.001)
    parser.add_argument('--lr_step', nargs='+', type=int, default=[30, 40],
                        help='learning rate milestones (epochs)')
    parser.add_argument('--lr_factor', type=float, default=0.1)
    parser.add_argument('--image_size', nargs='+', type=int,
                        default=[192, 192],
                        help='image size (only square supported)')
    parser.add_argument('--sigma', type=int, default=2)
    parser.add_argument('--class_loss_weight', type=float, default=0.001,
                        help='classification loss weight (reference '
                             'hard-codes 0.001, train.py:63)')
    parser.add_argument('--log_dir', type=str, default='logs')
    parser.add_argument('--save_dir', type=str, default='output')
    parser.add_argument('--num_workers', type=int, default=8)
    parser.add_argument('--seed', type=int, default=42)
    # TPU-native extensions
    parser.add_argument('--dtype', type=str, default='bfloat16',
                        choices=['bfloat16', 'float32', 'mixed'],
                        help="compute dtype; 'mixed' = bf16 backbone + f32 "
                             "decoder (restores classification-gradient "
                             "fidelity at near-bf16 speed — see "
                             "ModelConfig.decoder_dtype)")
    parser.add_argument('--decoder_dtype', type=str, default='',
                        choices=['', 'float32', 'bfloat16'],
                        help='explicit decoder dtype override (diagnostic '
                             'bisection; --dtype mixed is the supported '
                             'recipe)')
    parser.add_argument('--early_dtype', type=str, default='',
                        choices=['', 'float32', 'bfloat16'],
                        help='backbone precision scheduling: dtype of the '
                             'first --early_units GELAN units '
                             '(ModelConfig.early_dtype)')
    parser.add_argument('--early_units', type=int, default=3)
    parser.add_argument('--grad_demix', type=str, default='auto',
                        choices=['auto', 'on', 'off', 'batched'],
                        help='de-mixed per-task gradient pullbacks (exact '
                             'bf16 multi-task gradients; auto = on under '
                             'bf16 compute). batched = same de-mixed math '
                             'as ONE batch-2 backward (residuals read '
                             'once) instead of two pullbacks')
    parser.add_argument('--mesh', type=str, default='',
                        help="mesh spec, e.g. 'data=8' or 'data=4,model=2'; "
                             'empty = single device')
    parser.add_argument('--canvas_size', type=int, default=256)
    parser.add_argument('--resume', action='store_true',
                        help='resume from last checkpoint if present')
    parser.add_argument('--host_device_count', type=int, default=0,
                        help='simulate N virtual CPU devices (mesh testing '
                             'without hardware)')
    parser.add_argument('--distributed', type=str, default='',
                        metavar='HOST:PORT,NPROC,PID',
                        help='multi-host data parallelism: connect this '
                             'process to the jax.distributed coordination '
                             'service (run one copy per host; --mesh then '
                             'spans the GLOBAL device list and each '
                             'process loads its own row-slice of every '
                             'batch). save_dir/log_dir must be on storage '
                             'all hosts can read. Rehearsable on one '
                             'machine: two processes with '
                             '--host_device_count (tests/'
                             'test_distributed.py)')
    parser.add_argument('--profile', type=int, default=0, metavar='N',
                        help='capture a jax.profiler trace over the first '
                             'N train steps (written to '
                             '<save_dir>/<run>/profile; view with '
                             'TensorBoard/xprof)')
    parser.add_argument('--device_cache', action='store_true',
                        help='stage the train/val splits into HBM once '
                             'and serve epochs by on-device gather — '
                             'removes the per-epoch host->device upload '
                             'on link-bound hosts (single-device only; '
                             'hgr_tpu/data/device_cache.py)')
    parser.add_argument('--cache_snapshot', default='', metavar='DIR',
                        help='with --device_cache: persist the staged '
                             'rows to DIR on first build and refill HBM '
                             'from the on-disk memmaps on later runs — '
                             'a resume/restart skips JPEG decode and '
                             'canvas staging (stale snapshots rebuild '
                             'automatically)')
    parser.add_argument('--remat', action='store_true',
                        help='rematerialize the backbone body and pose '
                             'head in the backward pass — frees ~8 GB of '
                             'live HBM at B=1024 for one extra backbone '
                             'forward (~15%% of step FLOPs); pair with '
                             '--device_cache when the cached split + big '
                             'batch must share one chip')
    parser.add_argument('--grad_accum', type=int, default=1,
                        help='sequential microbatches per optimizer step '
                             '(one exactly-combined update; peak '
                             'activation HBM drops to one microbatch) — '
                             'pairs with --device_cache/--remat for '
                             'bs-1024 recipes beside an HBM-resident '
                             'dataset cache; composes with --mesh '
                             '(batch_size must divide by accum x data '
                             'axis)')
    parser.add_argument('--debug_images', action='store_true',
                        help='dump GT/pred/heatmap grids every 100 train '
                             'batches and one val batch (with attention) '
                             'each epoch (reference train.py:148-174 '
                             'cadence); works under --mesh too')
    return parser.parse_args()


def main():
    args = parse_args()
    assert args.image_size[0] == args.image_size[1], \
        "Only support square images for now."

    from hgr_tpu.utils.platform import force_host_cpu

    force_host_cpu(args.host_device_count)

    if args.distributed:
        from hgr_tpu.parallel import distributed

        addr, nproc, pid = distributed.parse_spec(args.distributed)
        distributed.initialize(addr, nproc, pid)

    import jax

    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    is_main = jax.process_index() == 0

    from hgr_tpu.config import ModelConfig, TrainConfig, load_data_config
    from hgr_tpu.data.dataset import read_annotations
    from hgr_tpu.data.loader import BatchLoader
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.train.loop import fit
    from hgr_tpu.train.state import create_train_state

    data_cfg = load_data_config(args.data_config)
    model_name = "{}_{}x{}_{}".format(
        args.backbone, args.image_size[0], args.image_size[1], args.suffix)
    save_path = os.path.join(args.save_dir, model_name)
    os.makedirs(save_path, exist_ok=True)

    image_size = (args.image_size[0], args.image_size[1])
    mesh_shape = {}
    if args.mesh:
        mesh_shape = {k: int(v) for k, v in
                      (kv.split('=') for kv in args.mesh.split(','))}
    tp_requested = mesh_shape.get('model', 1) > 1
    # packed kernel / head-sharded 'split' kernel / XLA-chain fallback —
    # policy + rationale in parallel/mesh.py:resolve_fused_attention.
    # (local import: parallel.mesh pulls in jax, which must init after
    # force_host_cpu above)
    from hgr_tpu.parallel.mesh import resolve_fused_attention
    fused_attention = resolve_fused_attention(mesh_shape, ModelConfig.heads)
    model_cfg = ModelConfig(
        num_joints=data_cfg.num_joints,
        num_classes=data_cfg.num_classes,
        image_size=image_size,
        backbone='large' if args.backbone == 'gelanl' else 'small',
        compute_dtype='bfloat16' if args.dtype == 'mixed' else args.dtype,
        decoder_dtype=(args.decoder_dtype or
                       ('float32' if args.dtype == 'mixed' else None)),
        early_dtype=args.early_dtype or None,
        early_units=args.early_units,
        fused_attention=fused_attention,
        remat=args.remat,
    )
    train_cfg = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        lr_step=tuple(args.lr_step), lr_factor=args.lr_factor,
        sigma=float(args.sigma), seed=args.seed,
        class_loss_weight=args.class_loss_weight,
        num_workers=args.num_workers, log_dir=args.log_dir,
        save_dir=args.save_dir, canvas_size=args.canvas_size,
        grad_accum=args.grad_accum, grad_demix=args.grad_demix,
    )
    if args.grad_accum > 1:
        denom = args.grad_accum * max(
            1, mesh_shape.get('data', 1) if mesh_shape else 1)
        if args.batch_size % denom:
            raise SystemExit(
                f"--batch_size {args.batch_size} must divide by "
                f"grad_accum x data-axis ({denom})")

    from hgr_tpu.data.pipeline import staging_window_fraction

    window_frac = staging_window_fraction(data_cfg.augments)

    if args.device_cache and tp_requested:
        raise SystemExit("--device_cache supports single-device and "
                         "pure-DP meshes; tensor-parallel meshes would "
                         "replicate the cache across 'model' (see "
                         "hgr_tpu/data/device_cache.py)")

    n_proc = jax.process_count()
    if n_proc > 1:
        # Multi-host scope: pure data parallelism over the global mesh.
        # TP params would need cross-process sharded device_put of host
        # arrays; the HBM cache would need per-process shard staging —
        # both are single-host features today.
        if tp_requested:
            raise SystemExit("--distributed supports pure-DP meshes "
                             "(data=N); tensor parallelism is "
                             "single-host")
        if args.device_cache:
            raise SystemExit("--device_cache is single-host; use the "
                             "streaming loader under --distributed")
        if not mesh_shape:
            raise SystemExit("--distributed requires --mesh data=N over "
                             f"the global device count "
                             f"({len(jax.devices())})")
        if mesh_shape.get('data', 1) != len(jax.devices()):
            raise SystemExit(
                f"--distributed: mesh data axis must equal the global "
                f"device count {len(jax.devices())}, got {mesh_shape}")
        if args.batch_size % (n_proc * max(1, args.grad_accum)):
            raise SystemExit(
                f"--batch_size {args.batch_size} must divide by "
                f"num_processes x grad_accum "
                f"({n_proc} x {args.grad_accum})")

    mesh = None
    if mesh_shape:
        from hgr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(mesh_shape)
        if is_main:
            print(f"mesh: {mesh_shape}"
                  + (f" over {n_proc} processes" if n_proc > 1 else ""))

    def make_loader(split_dir, shuffle, drop_last, cache=False):
        idx = read_annotations(split_dir, data_cfg.names)
        kw = dict(
            batch_size=args.batch_size, canvas_size=args.canvas_size,
            num_joints=data_cfg.num_joints, shuffle=shuffle, seed=args.seed,
            drop_last=drop_last, num_workers=args.num_workers,
            window_frac=window_frac)
        if n_proc > 1:
            # device-cache loaders are gated off above; the streaming
            # loader materializes this process's row-slice of every
            # global batch (identical global order on all processes).
            kw.update(process_count=n_proc,
                      process_index=jax.process_index())
        if cache and args.device_cache:
            snap = ''
            if args.cache_snapshot:
                # key by basename + a hash of the absolute split path so
                # different datasets sharing one snapshot root (every
                # extracted split is named 'train'/'val') don't collide
                # on the same subdir and thrash each other's snapshots
                import hashlib
                abspath = os.path.abspath(os.path.normpath(split_dir))
                snap = os.path.join(
                    args.cache_snapshot,
                    os.path.basename(abspath) + '-'
                    + hashlib.sha256(abspath.encode()).hexdigest()[:8])
            if mesh is not None:
                from hgr_tpu.data.device_cache import (
                    ShardedDeviceCacheLoader,
                )
                return idx, ShardedDeviceCacheLoader(
                    idx, mesh, snapshot_dir=snap, **kw)
            from hgr_tpu.data.device_cache import DeviceCacheLoader
            return idx, DeviceCacheLoader(idx, snapshot_dir=snap, **kw)
        return idx, BatchLoader(idx, **kw)

    # No split drops its ragged tail: the reference's DataLoaders all
    # default drop_last=False (libs/load.py:280-305), so the train tail
    # batch is padded by sample-repetition and masked out of the loss/
    # metrics (hgr_tpu/data/loader.py) — static shapes AND every sample
    # trains each epoch.
    # test streams even under --device_cache: it runs once at the end,
    # so resident HBM is better spent on the train/val sets.
    train_idx, train_loader = make_loader(
        os.path.join(data_cfg.path, data_cfg.train), True, False, cache=True)
    _, val_loader = make_loader(
        os.path.join(data_cfg.path, data_cfg.val), False, False, cache=True)
    _, test_loader = make_loader(
        os.path.join(data_cfg.path, data_cfg.test), False, False)

    model = MultiTaskNet.from_config(model_cfg)
    steps_per_epoch = len(train_loader)
    milestones = [m * steps_per_epoch for m in args.lr_step]
    state, lr_schedule = create_train_state(
        model, jax.random.PRNGKey(args.seed),
        (1, image_size[0], image_size[1], 3),
        lr=args.lr, milestones_steps=milestones, lr_factor=args.lr_factor)

    tensor_parallel = False
    if mesh is not None:
        from hgr_tpu.parallel.steps import shard_state

        tensor_parallel = tp_requested
        state = shard_state(state, mesh, tensor_parallel)

    if args.resume:
        from hgr_tpu.train.checkpoint import CheckpointManager

        from hgr_tpu.parallel.distributed import coordinator_decision

        ckpt = CheckpointManager(os.path.join(save_path, "weight"))
        # restore is a collective under multi-process; every process
        # must take the coordinator's branch (has() reads shared fs).
        # Runs AFTER shard_state: the restore template must carry the
        # same GLOBAL sharding on every process — fresh
        # create_train_state arrays are committed to each process's own
        # first local device, and orbax restoring into per-process
        # single-device shardings attempts an unsupported cross-host
        # transfer (fit()'s internal 'best' restore already uses the
        # sharded template for the same reason).
        if coordinator_decision(ckpt.has("last")):
            state = ckpt.restore(state, "last")
            if is_main:
                print(f"resumed from step {int(state.step)}")

    if is_main:
        print(f"{len(train_idx)} train samples, "
              f"{steps_per_epoch} steps/epoch")
    fit(model_cfg, train_cfg, data_cfg, state, train_loader, val_loader,
        test_loader, save_path=save_path, log_dir=args.log_dir,
        run_name=model_name, mesh=mesh, tensor_parallel=tensor_parallel,
        debug_images=args.debug_images, lr_fn=lr_schedule,
        profile_steps=args.profile)


if __name__ == "__main__":
    main()
