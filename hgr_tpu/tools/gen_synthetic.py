"""Parallel synthetic-dataset generator for scale rehearsals.

Writes a HaGRID-format dataset (reference libs/load.py:208-228 layout) of
arbitrary size by fanning ``write_synthetic_split`` chunks over worker
processes. Each chunk gets its own image directory ``<out>/<split>_pNN/``
and annotation file ``<out>/annotations/<split>/<split>_pNN.json`` — the
reader globs every ``*.json`` in the split's annotation dir and resolves
each one's images from its own stem, so chunked output is consumed
identically to a single-file split.

Used for the full-recipe-scale rehearsal (VERDICT r2 #6: 100k+ images,
40 epochs, bs 1024 through the complete cli/train.py path).
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import shutil
import time

from hgr_tpu.data.synthetic import write_synthetic_split


def _gen_chunk(job):
    out_dir, split, part, count, image_size, seed = job
    chunk = f"{split}_p{part:02d}"
    t0 = time.time()
    ann_dir = write_synthetic_split(
        out_dir, chunk, count, image_size=image_size, seed=seed)
    # Relocate the chunk's json into the shared split annotation dir so
    # one data-config entry (annotations/<split>) covers every chunk.
    # parents[2] of the new path is still <out_dir>; the stem still
    # resolves images from <out_dir>/<chunk>/.
    split_ann = os.path.join(out_dir, "annotations", split)
    os.makedirs(split_ann, exist_ok=True)
    src = os.path.join(ann_dir, chunk + ".json")
    shutil.move(src, os.path.join(split_ann, chunk + ".json"))
    os.rmdir(ann_dir)
    return chunk, count, time.time() - t0


def generate(out_dir: str, counts: dict, image_size: int = 192,
             chunk_size: int = 10240, workers: int = 8,
             base_seed: int = 0) -> None:
    jobs = []
    seed = base_seed
    for split, total in counts.items():
        part = 0
        remaining = total
        while remaining > 0:
            n = min(chunk_size, remaining)
            jobs.append((out_dir, split, part, n, image_size, seed))
            part += 1
            seed += 1
            remaining -= n
    t0 = time.time()
    with mp.Pool(workers) as pool:
        for chunk, count, dt in pool.imap_unordered(_gen_chunk, jobs):
            print(f"  {chunk}: {count} images in {dt:.1f}s", flush=True)
    print(f"total: {sum(counts.values())} images in {time.time() - t0:.1f}s")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--train", type=int, default=102_400)
    p.add_argument("--val", type=int, default=10_240)
    p.add_argument("--test", type=int, default=10_240)
    p.add_argument("--image_size", type=int, default=192)
    p.add_argument("--chunk_size", type=int, default=10_240)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    counts = {"train": args.train, "val": args.val, "test": args.test}
    generate(args.out_dir, counts, image_size=args.image_size,
             chunk_size=args.chunk_size, workers=args.workers,
             base_seed=args.seed)

    # Emit a ready-to-use data config beside the dataset.
    cfg = {
        "path": os.path.abspath(args.out_dir),
        "train": "annotations/train",
        "val": "annotations/val",
        "test": "annotations/test",
    }
    cfg_path = os.path.join(args.out_dir, "data_config_fragment.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"wrote {cfg_path}")


if __name__ == "__main__":
    main()
