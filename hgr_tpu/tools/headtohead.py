"""Head-to-head convergence: reference (torch) vs hgr_tpu, same fixture,
same recipe, same seed.

Builds a shared synthetic fixture in the reference annotation format,
trains BOTH stacks with the identical recipe (reference README.md:62-71 /
train.py:49-56: bs 32, AdamW lr 1e-4, MultiStepLR [30]x0.1, 40 epochs,
sigma 2, seed 42), and writes a side-by-side epoch table + final-metric
summary. This is the sandbox's accuracy evidence for the "top-1 within
0.5% of reference" north star (BASELINE.json) — HaGRID itself is not
available here.

Usage:
  python -m hgr_tpu.tools.headtohead --workdir /tmp/h2h \
      [--epochs 40] [--train_n 380] [--ours_platform tpu|cpu]

The two runs execute as subprocesses (the reference harness shims
lightning/torchvision in sys.modules — keep that out of this process).
Outputs in <workdir>: reference_metrics.jsonl, ours logs/.../metrics.jsonl,
headtohead_summary.json, headtohead_table.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _pythonpath_with_repo() -> str:
    """Prepend the repo to PYTHONPATH without clobbering the inherited
    value — the TPU backend plugin itself may be resolved via PYTHONPATH
    (replacing it breaks jax backend discovery in the child)."""
    existing = os.environ.get("PYTHONPATH", "")
    return REPO + (os.pathsep + existing if existing else "")


def build_fixture(root: str, train_n: int, val_n: int, test_n: int,
                  image_size: int = 224) -> str:
    """Shared fixture + data-config YAML (reference configs/hagrid.yaml
    schema). Returns the config path."""
    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.data.synthetic import write_synthetic_split

    os.makedirs(root, exist_ok=True)
    for split, n, seed in (("train", train_n, 0), ("val", val_n, 1),
                           ("test", test_n, 2)):
        write_synthetic_split(root, split, n, image_size=image_size,
                              seed=seed)
    cfg = os.path.join(root, "data.yaml")
    with open(cfg, "w") as f:
        f.write(f"path: {root}\n"
                "train: annotations/train\n"
                "val: annotations/val\n"
                "test: annotations/test\n\n"
                "num_joints: 21\nnum_classes: 19\n\nnames:\n")
        for k, v in DEFAULT_NAMES.items():
            f.write(f"  {k}: {v}\n")
        f.write("\naugments:\n  rotate_factor: 20\n  scale_factor: 0.35\n"
                "  translate_factor: 0.02\n  horizontal_flip: true\n"
                "  color_jittering: true\n")
    return cfg


def read_jsonl(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def run_reference(cfg: str, workdir: str, args) -> str:
    out = os.path.join(workdir, "reference_metrics.jsonl")
    cmd = [sys.executable, "-m", "hgr_tpu.tools.reference_train",
           "--data_config", cfg, "--epochs", str(args.epochs),
           "--batch_size", str(args.batch_size), "--lr", str(args.lr),
           "--lr_step", *[str(s) for s in args.lr_step],
           "--lr_factor", str(args.lr_factor), "--sigma", str(args.sigma),
           "--seed", str(args.seed), "--out", out]
    env = dict(os.environ, PYTHONPATH=_pythonpath_with_repo())
    subprocess.run(cmd, check=True, cwd=REPO, env=env)
    return out


def run_ours(cfg: str, workdir: str, args) -> str:
    save_dir = os.path.join(workdir, "ours_out")
    log_dir = os.path.join(workdir, "ours_logs")
    cmd = [sys.executable, os.path.join(REPO, "cli", "train.py"),
           "--data_config", cfg, "--suffix", "h2h",
           "--batch_size", str(args.batch_size),
           "--epochs", str(args.epochs), "--lr", str(args.lr),
           "--lr_step", *[str(s) for s in args.lr_step],
           "--lr_factor", str(args.lr_factor), "--sigma", str(args.sigma),
           "--seed", str(args.seed), "--dtype", args.ours_dtype,
           "--num_workers", "2",
           "--save_dir", save_dir, "--log_dir", log_dir]
    env = dict(os.environ, PYTHONPATH=_pythonpath_with_repo())
    if args.ours_platform:
        env["JAX_PLATFORMS"] = args.ours_platform
    subprocess.run(cmd, check=True, cwd=REPO, env=env)
    return os.path.join(log_dir, "gelans_192x192_h2h", "metrics.jsonl")


def summarize(ref_path: str, ours_path: str, workdir: str) -> dict:
    ref = read_jsonl(ref_path)
    ref_final = next((r for r in ref if "test_f1" in r), None)
    ref_epochs = [r for r in ref if "epoch" in r]

    ours = read_jsonl(ours_path)
    ours_final = next((r for r in ours if "test/epoch_f1" in r), None)
    ours_epochs = [r for r in ours if "epoch" in r]

    lines = ["| epoch | ref val_loss | ours val_loss | ref val_F1 | "
             "ours val_F1 | ref pose_acc | ours pose_acc |",
             "|---|---|---|---|---|---|---|"]
    for r, o in zip(ref_epochs, ours_epochs):
        lines.append(
            f"| {r['epoch']} | {r['val_total_loss']:.4f} | "
            f"{o['val/total_loss']:.4f} | {r['val_f1']:.4f} | "
            f"{o['val/epoch_f1']:.4f} | {r['val_pose_acc']:.4f} | "
            f"{o['val/pose_acc']:.4f} |")
    summary = {
        "reference": {
            "test_f1": ref_final and ref_final["test_f1"],
            "test_pose_acc": ref_final and ref_final.get("test_pose_acc"),
            "final_val_f1": ref_epochs and ref_epochs[-1]["val_f1"],
            "final_val_pose_acc":
                ref_epochs and ref_epochs[-1]["val_pose_acc"],
            "epoch_time_s_median": sorted(
                r["epoch_time_s"] for r in ref_epochs)[len(ref_epochs) // 2]
                if ref_epochs else None,
        },
        "ours": {
            "test_f1": ours_final and ours_final["test/epoch_f1"],
            "test_pose_acc": ours_final and ours_final.get("test/pose_acc"),
            "final_val_f1": ours_epochs and ours_epochs[-1]["val/epoch_f1"],
            "final_val_pose_acc":
                ours_epochs and ours_epochs[-1]["val/pose_acc"],
            "epoch_time_s_median": sorted(
                o["epoch_time_s"] for o in ours_epochs)[len(ours_epochs) // 2]
                if ours_epochs else None,
        },
    }
    if (summary["reference"]["test_f1"] is not None
            and summary["ours"]["test_f1"] is not None):
        summary["test_f1_delta_ours_minus_ref"] = (
            summary["ours"]["test_f1"] - summary["reference"]["test_f1"])
    with open(os.path.join(workdir, "headtohead_table.md"), "w") as f:
        f.write("\n".join(lines) + "\n\n" + json.dumps(summary, indent=2)
                + "\n")
    with open(os.path.join(workdir, "headtohead_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("\n".join(lines[-6:]))
    print(json.dumps(summary, indent=2))
    return summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/hgr_headtohead")
    p.add_argument("--train_n", type=int, default=380)
    p.add_argument("--val_n", type=int, default=190)
    p.add_argument("--test_n", type=int, default=380)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_step", nargs="+", type=int, default=[30])
    p.add_argument("--lr_factor", type=float, default=0.1)
    p.add_argument("--sigma", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ours_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--ours_platform", default="",
                   help="JAX_PLATFORMS for our run ('' = default backend)")
    p.add_argument("--skip_reference", action="store_true",
                   help="reuse an existing reference_metrics.jsonl")
    p.add_argument("--skip_ours", action="store_true")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    fixture = os.path.join(args.workdir, "fixture")
    cfg = build_fixture(fixture, args.train_n, args.val_n, args.test_n)

    ref_out = os.path.join(args.workdir, "reference_metrics.jsonl")
    if not args.skip_reference:
        ref_out = run_reference(cfg, args.workdir, args)
    ours_out = os.path.join(args.workdir, "ours_logs",
                            "gelans_192x192_h2h", "metrics.jsonl")
    if not args.skip_ours:
        ours_out = run_ours(cfg, args.workdir, args)
    summarize(ref_out, ours_out, args.workdir)


if __name__ == "__main__":
    main()
