"""Paired head-to-head statistics across seeds: F1 and pose (VERDICT
r4 #4/#5).

Collects (reference, ours) final TEST metrics per seed from the
committed round-4 artifacts plus any new round-5 workdirs, and reports
paired statistics for BOTH metrics: per-seed diffs, mean, sd, paired
t, a sign count, and a bootstrap 95% CI of the paired mean. The pose
lean gets the same treatment the F1 deficit got in round 4 (paired
stats first; bisect only if the sign holds with t >~ 2).

Usage:
  python -m hgr_tpu.tools.h2h_stats \
      [--r4_dir bench_artifacts/headtohead_r4] \
      [--r5_glob '/tmp/h2h_r5/s*'] [--out bench_artifacts/r5/h2h_stats.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def _read_jsonl(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def _final(rows, ref):
    """(test_f1, test_pose) from a metrics jsonl (ref or ours format).
    Takes the LAST test row — the best-checkpoint evaluation (some ours
    logs carry an interim test row before the final one)."""
    if ref:
        fins = [r for r in rows if "test_f1" in r]
        return ((fins[-1]["test_f1"], fins[-1]["test_pose_acc"])
                if fins else None)
    fins = [r for r in rows if "test/epoch_f1" in r]
    return ((fins[-1]["test/epoch_f1"], fins[-1]["test/pose_acc"])
            if fins else None)


# Reference seed-42 recipe-B finals: the r3 run's workdir was not
# committed; these are the documented numbers (BENCH_LOG round 3
# 'Recipe B' table / round 4 5-seed table, same run). Every other pair
# comes from committed/on-disk curves.
DOCUMENTED_REF = {"42": (0.1693, 0.5824)}


def collect(r4_dir: str, r5_glob: str):
    pairs = {}  # seed -> {"ref": (f1, pose), "ours": (f1, pose)}
    # round-4 layout: reference_seed{S}.jsonl + demix/ours_demix_seed{S}
    for p in glob.glob(os.path.join(r4_dir, "reference_seed*.jsonl")):
        seed = p.split("reference_seed")[1].split(".")[0]
        v = _final(_read_jsonl(p), ref=True)
        if v:
            pairs.setdefault(seed, {})["ref"] = v
    # r3 recipeB reference curves cover seeds 42/43/1337 (same recipe)
    for p in glob.glob(os.path.join(
            os.path.dirname(r4_dir), "headtohead_r3", "recipeB",
            "reference_seed*.jsonl")):
        seed = p.split("reference_seed")[1].split(".")[0]
        v = _final(_read_jsonl(p), ref=True)
        if v:
            pairs.setdefault(seed, {}).setdefault("ref", v)
    for p in glob.glob(os.path.join(r4_dir, "demix",
                                    "ours_demix_seed*.jsonl")):
        seed = p.split("ours_demix_seed")[1].split(".")[0]
        v = _final(_read_jsonl(p), ref=False)
        if v:
            pairs.setdefault(seed, {})["ours"] = v
    # round-5 layout: s{SEED}/reference_metrics.jsonl +
    # s{SEED}/ours_logs/gelans_192x192_h2h/metrics.jsonl
    for d in glob.glob(r5_glob):
        seed = os.path.basename(d).lstrip("s")
        rp = os.path.join(d, "reference_metrics.jsonl")
        op = os.path.join(d, "ours_logs", "gelans_192x192_h2h",
                          "metrics.jsonl")
        if os.path.exists(rp):
            v = _final(_read_jsonl(rp), ref=True)
            if v:
                pairs.setdefault(seed, {})["ref"] = v
        if os.path.exists(op):
            v = _final(_read_jsonl(op), ref=False)
            if v:
                pairs.setdefault(seed, {})["ours"] = v
    for seed, v in DOCUMENTED_REF.items():
        pairs.setdefault(seed, {}).setdefault("ref", v)
    return {s: v for s, v in pairs.items() if "ref" in v and "ours" in v}


def paired_stats(diffs: np.ndarray, rng=None) -> dict:
    n = len(diffs)
    mean = float(diffs.mean())
    sd = float(diffs.std(ddof=1)) if n > 1 else float("nan")
    t = mean / (sd / np.sqrt(n)) if n > 1 and sd > 0 else float("nan")
    rng = rng or np.random.RandomState(0)
    boots = np.array([
        rng.choice(diffs, size=n, replace=True).mean()
        for _ in range(10000)])
    return {
        "n": n,
        "mean": round(mean, 4),
        "sd": round(sd, 4),
        "paired_t": round(float(t), 2),
        "ours_ahead": int((diffs > 0).sum()),
        "boot95_ci": [round(float(np.percentile(boots, 2.5)), 4),
                      round(float(np.percentile(boots, 97.5)), 4)],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--r4_dir", default="bench_artifacts/headtohead_r4")
    ap.add_argument("--r5_glob", default="/tmp/h2h_r5/s*")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    pairs = collect(args.r4_dir, args.r5_glob)
    seeds = sorted(pairs, key=lambda s: int(s))
    rows = []
    for s in seeds:
        rf1, rp = pairs[s]["ref"]
        of1, op = pairs[s]["ours"]
        rows.append({"seed": int(s), "ref_f1": round(rf1, 4),
                     "ours_f1": round(of1, 4),
                     "ref_pose": round(rp, 4), "ours_pose": round(op, 4)})
        print(f"seed {s:>6}: F1 {rf1:.4f} vs {of1:.4f} "
              f"({of1 - rf1:+.4f}) | pose {rp:.4f} vs {op:.4f} "
              f"({op - rp:+.4f})")

    d_f1 = np.array([r["ours_f1"] - r["ref_f1"] for r in rows])
    d_pose = np.array([r["ours_pose"] - r["ref_pose"] for r in rows])
    result = {
        "seeds": rows,
        "f1": paired_stats(d_f1),
        "pose": paired_stats(d_pose),
    }
    print(json.dumps({"f1": result["f1"], "pose": result["pose"]},
                     indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
