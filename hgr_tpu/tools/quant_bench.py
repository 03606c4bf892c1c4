"""int8 PTQ serving benchmark: accuracy delta + forward throughput.

Trains a classifier on a synthetic fixture (or reuses a checkpoint),
quantizes the GELAN backbone (infer/quant.py), and reports:

  * test macro-F1: bf16 float path vs int8 backbone (the accuracy cost
    of quantization, measured end-to-end through the eval pipeline);
  * forward throughput at --bench_batch: bf16 vs int8 (crops/s).

(That the quantized graph round-trips StableHLO export is covered by
tests/test_quant.py::test_quantized_graph_exports_stablehlo, not here.)

Usage (real chip):
  python -m hgr_tpu.tools.quant_bench --workdir /tmp/quantbench \
      [--train_n 4096 --epochs 12 --batch 256 --bench_batch 4096]
  python -m hgr_tpu.tools.quant_bench --workdir ... --ckpt <orbax_dir> \
      --data_config <yaml>     # skip training, quantize this checkpoint

Writes <workdir>/quant_bench.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from hgr_tpu.tools.headtohead import _pythonpath_with_repo, build_fixture


def train_fixture_model(cfg: str, workdir: str, args) -> str:
    """Train via the real CLI; returns the best-checkpoint directory."""
    save_dir = os.path.join(workdir, "output")
    env = dict(os.environ, PYTHONPATH=_pythonpath_with_repo())
    cmd = [
        sys.executable, os.path.join(REPO, "cli", "train.py"),
        "--data_config", cfg, "--suffix", "quantbench",
        "--batch_size", str(args.batch), "--epochs", str(args.epochs),
        "--lr", str(args.lr), "--lr_step", str(max(args.epochs - 4, 1)),
        "--seed", "42", "--log_dir", os.path.join(workdir, "logs"),
        "--save_dir", save_dir, "--num_workers", "8",
    ]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=env)
    runs = [os.path.join(save_dir, d) for d in os.listdir(save_dir)]
    run_dir = max(runs, key=os.path.getmtime)
    best = os.path.join(run_dir, "weight", "best")
    return best if os.path.isdir(best) else os.path.join(
        run_dir, "weight", "last")


def make_prep(image_size):
    import jax

    from hgr_tpu.data.pipeline import apply_augment_batch, identity_params

    def prep_fn(c, a, s, j, v):
        return apply_augment_batch(
            c, a, s, j, v, identity_params(c.shape[0]),
            image_size=image_size,
            heatmap_size=(image_size[0] // 4, image_size[1] // 4),
            enable_jitter=False)["image"]

    return jax.jit(prep_fn)


def calibration_batches(loader, prep, n_batches: int):
    import jax
    import jax.numpy as jnp

    out = []
    for i, batch in enumerate(loader):
        if i >= n_batches:
            break
        batch.pop("valid", None)
        out.append(np.asarray(jax.block_until_ready(prep(
            jnp.asarray(batch["canvas"]),
            jnp.asarray(batch["orig_to_canvas"]),
            jnp.asarray(batch["sizes_hw"]),
            jnp.asarray(batch["joints"]),
            jnp.asarray(batch["joints_vis"])))))
    return out


def time_forward(fn, x, iters: int = 30, warmup: int = 5) -> float:
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(x)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(x)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--ckpt", default="",
                    help="existing orbax ckpt dir (skips training)")
    ap.add_argument("--data_config", default="",
                    help="data config to eval with (with --ckpt)")
    ap.add_argument("--train_n", type=int, default=4096)
    ap.add_argument("--val_n", type=int, default=512)
    ap.add_argument("--test_n", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--calib_batches", type=int, default=4)
    ap.add_argument("--bench_batch", type=int, default=4096)
    ap.add_argument("--eval_batch", type=int, default=512)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    if args.ckpt:
        assert args.data_config, "--ckpt needs --data_config"
        cfg_path, ckpt = args.data_config, args.ckpt
    else:
        cfg_path = build_fixture(os.path.join(args.workdir, "fixture"),
                                 args.train_n, args.val_n, args.test_n)
        ckpt = train_fixture_model(cfg_path, args.workdir, args)
        print(f"trained checkpoint: {ckpt}", flush=True)

    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import load_data_config
    from hgr_tpu.data.dataset import read_annotations
    from hgr_tpu.data.loader import BatchLoader
    from hgr_tpu.infer.export import eval_exported
    from hgr_tpu.infer.quant import quantize_variables, calibrate_act_scales
    from hgr_tpu.infer.weights import load_classifier_weights
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.models.multitasknet import heatmaps_to_nchw
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    data_cfg = load_data_config(cfg_path)
    variables = load_classifier_weights(ckpt)
    model = MultiTaskNet(dtype=jnp.bfloat16)
    image_size = model.image_size

    def loader_for(split, batch):
        idx = read_annotations(
            os.path.join(data_cfg.path, split), data_cfg.names)
        return BatchLoader(idx, batch_size=batch, num_joints=
                           data_cfg.num_joints, shuffle=False,
                           drop_last=False, num_workers=8)

    prep = make_prep(image_size)

    # --- calibrate + quantize ---
    t0 = time.perf_counter()
    calib = calibration_batches(
        loader_for(data_cfg.train, args.eval_batch), prep,
        args.calib_batches)
    stats = calibrate_act_scales(model, variables, calib,
                                 need_attnmap=False)
    qvars = quantize_variables(variables, stats)
    calib_s = time.perf_counter() - t0
    print(f"calibrated on {sum(len(c) for c in calib)} crops "
          f"({calib_s:.1f}s)", flush=True)

    def fwd_with(vs):
        def f(x):
            logits, hmap, _ = model.apply(vs, x, train=False,
                                          need_attnmap=False)
            return logits, heatmaps_to_nchw(hmap)

        return jax.jit(f)

    f_float, f_int8 = fwd_with(variables), fwd_with(qvars)

    # --- accuracy through the full eval pipeline ---
    res_f = eval_exported(f_float, loader_for(data_cfg.test,
                                              args.eval_batch),
                          data_cfg.num_classes, image_size)
    res_q = eval_exported(f_int8, loader_for(data_cfg.test,
                                             args.eval_batch),
                          data_cfg.num_classes, image_size)

    # --- throughput at bench batch ---
    x = jnp.asarray(np.random.RandomState(0).uniform(
        -2.1, 2.6, (args.bench_batch,) + tuple(image_size) + (3,)
    ).astype(np.float32))
    t_float = time_forward(f_float, x)
    t_int8 = time_forward(f_int8, x)

    out = {
        "ckpt": ckpt,
        "test_f1_float": res_f["test_f1"],
        "test_f1_int8": res_q["test_f1"],
        "f1_delta": res_q["test_f1"] - res_f["test_f1"],
        "test_images": res_f["images"],
        "bench_batch": args.bench_batch,
        "fwd_ms_float": t_float * 1e3,
        "fwd_ms_int8": t_int8 * 1e3,
        "crops_per_s_float": args.bench_batch / t_float,
        "crops_per_s_int8": args.bench_batch / t_int8,
        "speedup": t_float / t_int8,
        "calib_crops": sum(len(c) for c in calib),
    }
    path = os.path.join(args.workdir, "quant_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
