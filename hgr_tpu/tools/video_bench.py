"""Offline video-path throughput: overlapped vs serial (VERDICT r3 #7).

Round 3 measured the batched-16 e2e video loop at 318 fps against an
808 fps device ceiling — the gap was the serial decode -> infer ->
annotate -> encode structure. detect_to_video now overlaps those stages
(decode thread + async dispatch window + FIFO encode); this tool builds
a synthetic frame set and times the SAME work at pipeline_depth=1
(old serial behavior, the in-flight window degenerates) vs the
overlapped default, plus the pure-decode floor for context.

Usage: python -m hgr_tpu.tools.video_bench [--frames 512] [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def build_frames(n: int, h: int, w: int, root: str) -> str:
    import cv2

    rng = np.random.RandomState(0)
    d = os.path.join(root, "frames")
    os.makedirs(d, exist_ok=True)
    base = rng.randint(0, 255, (h, w, 3), np.uint8)
    for i in range(n):
        img = np.roll(base, i * 7, axis=1).copy()
        cv2.circle(img, (w // 2 + (i * 5) % 60, h // 2), 40,
                   (255, 255, 255), -1)
        cv2.imwrite(os.path.join(d, f"f_{i:05d}.jpg"), img)
    return d


def decode_floor(d: str) -> float:
    import cv2
    import glob as g

    files = sorted(g.glob(os.path.join(d, "*.jpg")))
    t0 = time.perf_counter()
    for f in files:
        cv2.imread(f)
    return len(files) / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=640)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.infer.detect import HandGesturePipeline, detect_to_video
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.models.yolo import YOLOv7Tiny
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    root = tempfile.mkdtemp(prefix="video_bench_")
    frames_dir = build_frames(args.frames, args.h, args.w, root)
    dec_fps = decode_floor(frames_dir)
    print(json.dumps({"decode_floor_fps": round(dec_fps, 1)}), flush=True)

    # random weights: timing-only (same graph/cost as trained weights)
    cls_model = MultiTaskNet()
    cls_vars = cls_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 192, 192, 3)), train=False)
    det_model = YOLOv7Tiny(num_classes=1)
    det_vars = det_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 416, 416, 3)), train=False)
    pipeline = HandGesturePipeline(cls_vars, det_vars, DEFAULT_NAMES)
    results = {"frames": args.frames, "batch_frames": args.batch,
               "decode_floor_fps": round(dec_fps, 1)}
    for depth, tag in ((1, "serial"), (3, "overlapped")):
        out = os.path.join(root, f"out_{depth}.mp4")
        # warm (compile) outside the timed run
        n = detect_to_video(pipeline, frames_dir, out,
                            batch_frames=args.batch, pipeline_depth=depth)
        t0 = time.perf_counter()
        n = detect_to_video(pipeline, frames_dir, out,
                            batch_frames=args.batch, pipeline_depth=depth)
        dt = time.perf_counter() - t0
        results[tag + "_fps"] = round(n / dt, 1)
        print(json.dumps({tag: {"fps": round(n / dt, 1),
                                "frames": n, "s": round(dt, 2)}}),
              flush=True)
    results["speedup"] = round(
        results["overlapped_fps"] / results["serial_fps"], 2)
    print(json.dumps(results), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
