#!/bin/sh
# Full-recipe-scale rehearsal (VERDICT r2 #6): the complete cli/train.py
# path — native C++ decode+staging, HBM device cache, orbax best/last
# checkpoints, per-epoch val, final exact test eval — at the reference
# recipe's epoch count (40, README.md:62-71) and 10x round-2's volume,
# then cli/export.py on the best checkpoint with a full test-set eval
# through the deserialized StableHLO artifact.
#
# Dataset: 102,400 train / 10,240 val / 10,240 test synthetic 192x192
# crops (reference annotation layout). Canvas 160 keeps the full
# train+val device cache at ~8.7 GB of the chip's 16 GB HBM: the
# augment staging window is 0.748 * 192 = 144 px (pipeline.
# staging_window_fraction), so a 160 canvas stores it without
# downscaling, and the warp kernel device-pads per batch. The cache
# stores flat (n, cs*cs*3) rows (device_cache._flat_shapes) — natural
# shapes pick up XLA tile padding (19.2 GB, OOM) — and --remat frees
# the backbone's hi-res activations so the B=1024 backward fits beside
# the cache.
#
# Results: BENCH_LOG.md "Full-recipe-scale rehearsal" (round 3).
set -e
cd "$(dirname "$0")/.."

DATA=${DATA:-/tmp/hgr_r3/syn100k}
OUT=${OUT:-/tmp/hgr_r3}

if [ ! -d "$DATA/annotations/train" ]; then
  python -m hgr_tpu.tools.gen_synthetic --out_dir "$DATA" \
    --train 102400 --val 10240 --test 10240 --image_size 192 \
    --chunk_size 10240 --workers 2 --seed 0
fi

python cli/train.py \
  --data_config configs/rehearsal_100k.yaml \
  --suffix rehearsal100k \
  --batch_size 1024 --epochs 40 \
  --lr 0.001 --lr_step 30 40 --lr_factor 0.1 \
  --canvas_size 160 --device_cache --remat --grad_accum 2 \
  --num_workers 4 \
  --log_dir "$OUT/logs" --save_dir "$OUT/output"

python cli/export.py \
  --data_config configs/rehearsal_100k.yaml \
  --weight_path "$OUT/output/gelans_192x192_rehearsal100k/weight/best" \
  --out "$OUT/output/gelans_192x192_rehearsal100k/export" \
  --batch 256 --canvas_size 160
