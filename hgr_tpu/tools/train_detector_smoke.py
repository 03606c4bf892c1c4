"""Train the JAX YOLOv7-tiny briefly on synthetic hand-box scenes and
save a smoke-test weight artifact.

Closes VERDICT r2 Missing #2's second half: the ONNX-port parity test
pins the MATH of the detector against a torch oracle, but nothing proved
the detector architecture can actually LOCALIZE through the fused
letterbox->decode->best_box->crop graph. This tool trains the real
yolov7-tiny topology (models/yolo.py) from scratch on synthetic scenes
(a hand crop pasted at a random box over a textured background), then
evaluates best-box IoU — and writes the trained weights to
``tests/fixtures/yolo_smoke_weights.npz`` (float16) for
``tests/test_detector_smoke.py`` to drive the full inference pipeline.

Run on the TPU (minutes): ``python -m hgr_tpu.tools.train_detector_smoke``
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEFAULT_OUT = os.path.join(REPO, "tests", "fixtures",
                           "yolo_smoke_weights.npz")


def make_scene(rng: np.random.RandomState, size: int = 416,
               pad_prob: float = 0.3,
               shrink_prob: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
    """One synthetic frame: textured background + pasted hand crop.

    Returns (frame uint8 (size, size, 3) BGR, gt (4,) cxcywh pixels).
    ``pad_prob`` adds letterbox-style 114-gray bars so the detector
    also sees the padding the serving letterbox introduces
    (reference detect.py:15-45 pads with 114). ``shrink_prob``
    additionally rehearses the serving letterbox's downscale: wide
    frames (e.g. 480x640 -> r = 416/640 = 0.65) shrink the whole scene,
    so training must cover sub-1.0 scale or the detector is
    out-of-distribution exactly where the pipeline runs it."""
    from hgr_tpu.data.synthetic import make_hand_image

    frame = np.empty((size, size, 3), np.uint8)
    base = rng.randint(30, 160, 3)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for c in range(3):
        frame[..., c] = np.clip(
            base[c] + 50 * yy * rng.rand() + 50 * xx * rng.rand()
            + rng.randn(size, size) * 8, 0, 255).astype(np.uint8)

    if rng.rand() < pad_prob:
        bar = rng.randint(20, 80)
        if rng.rand() < 0.5:
            frame[:bar] = 114
            frame[-bar:] = 114
        else:
            frame[:, :bar] = 114
            frame[:, -bar:] = 114

    hand_size = rng.randint(80, 221)
    crop, _ = make_hand_image(rng, size=hand_size)
    x0 = rng.randint(0, size - hand_size + 1)
    y0 = rng.randint(0, size - hand_size + 1)
    frame[y0:y0 + hand_size, x0:x0 + hand_size] = crop
    gt = np.array([x0 + hand_size / 2.0, y0 + hand_size / 2.0,
                   float(hand_size), float(hand_size)], np.float32)

    if rng.rand() < shrink_prob:
        # serving-letterbox rehearsal: downscale the composed scene and
        # center it on 114 gray, exactly like a wide frame letterboxed
        # to the square detector input
        f = rng.uniform(0.55, 0.95)
        new = max(32, int(round(size * f)))
        small = _resize_u8(frame, new)
        off = (size - new) // 2
        frame = np.full((size, size, 3), 114, np.uint8)
        frame[off:off + new, off:off + new] = small
        scale = new / float(size)
        gt = np.array([gt[0] * scale + off, gt[1] * scale + off,
                       gt[2] * scale, gt[3] * scale], np.float32)
    return frame, gt


def _resize_u8(img: np.ndarray, new: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (new, new), interpolation=cv2.INTER_AREA)
    except ImportError:
        idx = (np.arange(new) * (img.shape[0] / new)).astype(np.int32)
        return img[idx][:, idx]


def make_batch(rng, batch: int, size: int = 416):
    frames = np.empty((batch, size, size, 3), np.uint8)
    gts = np.empty((batch, 4), np.float32)
    for i in range(batch):
        frames[i], gts[i] = make_scene(rng, size)
    return frames, gts


def iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[..., :2], b[..., :2])
    rb = np.minimum(a[..., 2:], b[..., 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


def flatten_vars(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_vars(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--unique_batches", type=int, default=250,
                   help="pre-generated batches cycled during training "
                        "(scene gen is ~2 s/batch on this 1-core host; "
                        "4000 unique scenes are plenty for the smoke)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--size", type=int, default=416)
    p.add_argument("--eval_n", type=int, default=64)
    p.add_argument("--out", default=DEFAULT_OUT)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import optax

    from hgr_tpu.models.yolo import YOLOv7Tiny, best_box, decode_predictions
    from hgr_tpu.models.yolo_loss import yolo_single_box_loss

    model = YOLOv7Tiny(num_classes=1, dtype=jnp.bfloat16)
    rng = np.random.RandomState(args.seed)
    variables = model.init(jax.random.PRNGKey(args.seed),
                           jnp.zeros((1, args.size, args.size, 3)),
                           train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, frames_u8, gt):
        x = frames_u8.astype(jnp.float32) / 255.0

        def loss_fn(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            total, parts = yolo_single_box_loss(outs, gt)
            return total, (parts, mut["batch_stats"])

        (total, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, total, parts

    t0 = time.time()
    pool = [make_batch(rng, args.batch, args.size)
            for _ in range(min(args.unique_batches, args.steps))]
    print(f"scene pool: {len(pool)} batches in {time.time() - t0:.0f}s",
          flush=True)
    for step in range(args.steps):
        frames, gts = pool[step % len(pool)]
        params, batch_stats, opt_state, total, parts = train_step(
            params, batch_stats, opt_state, jnp.asarray(frames),
            jnp.asarray(gts))
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss={float(total):.4f} "
                  f"box={float(parts['box']):.4f} "
                  f"obj={float(parts['obj']):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # --- eval: best-box IoU on fresh scenes ---
    @jax.jit
    def infer(frames_u8):
        x = frames_u8.astype(jnp.float32) / 255.0
        outs = model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)
        return best_box(decode_predictions(outs, num_classes=1))

    eval_rng = np.random.RandomState(args.seed + 999)
    frames, gts = make_batch(eval_rng, args.eval_n, args.size)
    boxes, scores = infer(jnp.asarray(frames))
    boxes, scores = np.asarray(boxes), np.asarray(scores)
    gt_xyxy = np.stack([gts[:, 0] - gts[:, 2] / 2, gts[:, 1] - gts[:, 3] / 2,
                        gts[:, 0] + gts[:, 2] / 2, gts[:, 1] + gts[:, 3] / 2],
                       axis=-1)
    ious = iou_xyxy(boxes, gt_xyxy)
    print(f"eval: mean IoU={ious.mean():.3f} "
          f"IoU>0.5 frac={float((ious > 0.5).mean()):.3f} "
          f"mean score={scores.mean():.3f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    flat = {f"params/{k}": v for k, v in flatten_vars(params).items()}
    flat.update({f"batch_stats/{k}": v
                 for k, v in flatten_vars(batch_stats).items()})
    np.savez_compressed(
        args.out, **{k: v.astype(np.float16) for k, v in flat.items()})
    print(f"saved {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB)", flush=True)


if __name__ == "__main__":
    main()
