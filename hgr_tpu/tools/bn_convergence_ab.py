"""Convergence A/B for the BN normalize-chain dtype knob.

The real-chip step A/B (tools/bn_dtype_ab.py) showed
HGR_TPU_BN_DTYPE=bfloat16 takes the B=1024 train step from 272.96 ms
to 255.58 ms (4,007 crops/s) with 16-step loss trajectories agreeing
to ~1e-4. That is necessary but not sufficient to flip the default:
this tool runs the REAL cli/train.py recipe on the shared synthetic
fixture twice — identical data, seed, and hyper-parameters; only the
env knob differs — and compares the per-epoch val curves and the final
test F1/pose-acc, writing everything to an artifacts dir.

Usage:
  python -m hgr_tpu.tools.bn_convergence_ab \
      [--train_n 4096 --epochs 60 --batch 256] [--out bench_artifacts/...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from hgr_tpu.tools.headtohead import _pythonpath_with_repo, build_fixture

EPOCH_RE = re.compile(
    r"epoch (\d+): train_loss=([\d.]+) val_loss=([\d.]+) "
    r"val_f1=([\d.]+) val_pose_acc=([\d.]+)")
TEST_RE = re.compile(r"Test F1 Score: ([\d.]+)")


def run_arm(name: str, cfg: str, workdir: str, args, bn_dtype: str):
    env = dict(os.environ, PYTHONPATH=_pythonpath_with_repo())
    if bn_dtype == "bfloat16":
        env["HGR_TPU_BN_DTYPE"] = "bfloat16"
    else:
        env.pop("HGR_TPU_BN_DTYPE", None)
    save_dir = os.path.join(workdir, f"out_{name}")
    cmd = [
        sys.executable, os.path.join(REPO, "cli", "train.py"),
        "--data_config", cfg, "--suffix", f"bnab_{name}",
        "--batch_size", str(args.batch), "--epochs", str(args.epochs),
        "--lr", str(args.lr), "--lr_step", str(max(args.epochs - 10, 1)),
        "--seed", "42", "--dtype", "bfloat16",
        "--log_dir", os.path.join(workdir, f"logs_{name}"),
        "--save_dir", save_dir, "--num_workers", "8",
    ]
    print("+", " ".join(cmd), f"[HGR_TPU_BN_DTYPE={bn_dtype}]", flush=True)
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError(f"arm {name} failed rc={proc.returncode}")
    epochs = [
        {"epoch": int(m[0]), "train_loss": float(m[1]),
         "val_loss": float(m[2]), "val_f1": float(m[3]),
         "val_pose_acc": float(m[4])}
        for m in EPOCH_RE.findall(proc.stdout)]
    mtest = TEST_RE.search(proc.stdout)
    # Guard against a vacuously-"complete" A/B: if the train-log format
    # drifts (or a loss prints as nan, which EPOCH_RE does not match),
    # fail loudly instead of writing nulls into the summary.
    if not epochs or mtest is None:
        raise RuntimeError(
            f"arm {name}: could not parse metrics from train output "
            f"(epochs={len(epochs)}, test_f1={'found' if mtest else 'MISSING'})."
            f" stdout tail:\n{proc.stdout[-2000:]}")
    return {"bn_dtype": bn_dtype, "epochs": epochs,
            "test_f1": float(mtest[1])}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_n", type=int, default=4096)
    ap.add_argument("--val_n", type=int, default=512)
    ap.add_argument("--test_n", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--workdir", type=str, default="/tmp/bn_ab_fixture")
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "bench_artifacts",
                                         "bn_convergence_ab"))
    ap.add_argument("--arms", type=str, nargs="+", default=["f32", "bf16"],
                    choices=["f32", "bf16"],
                    help="which arms to (re)run; an arm not listed is "
                         "loaded from its existing <out>/<arm>.json")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    cfg = build_fixture(os.path.join(args.workdir, "data"),
                        args.train_n, args.val_n, args.test_n)
    results = {}
    for name, dt in (("f32", "float32"), ("bf16", "bfloat16")):
        if name not in args.arms:
            with open(os.path.join(args.out, f"{name}.json")) as f:
                results[name] = json.load(f)
            continue
        results[name] = run_arm(name, cfg, args.workdir, args, dt)
        with open(os.path.join(args.out, f"{name}.json"), "w") as f:
            json.dump(results[name], f, indent=1)
    summary = {
        "recipe": {"train_n": args.train_n, "epochs": args.epochs,
                   "batch": args.batch, "lr": args.lr, "seed": 42,
                   "dtype": "bfloat16"},
        "test_f1_f32bn": results["f32"]["test_f1"],
        "test_f1_bf16bn": results["bf16"]["test_f1"],
        "final_val_f32bn": results["f32"]["epochs"][-1]
        if results["f32"]["epochs"] else None,
        "final_val_bf16bn": results["bf16"]["epochs"][-1]
        if results["bf16"]["epochs"] else None,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
