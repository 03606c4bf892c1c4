"""Two-stage video inference: YOLOv7-tiny detect -> crop -> classify,
as ONE jit-compiled device graph per frame shape.

Pipeline parity with reference detect.py:48-207, TPU-native:
  * letterbox to the detector size on device (reference letterbox,
    detect.py:15-45: r = min(new/h, new/w), bilinear resize, pad 114);
  * BGR->RGB only for the detector (detect.py:80), /255;
  * top-1 box (outputs[0], detect.py:129), un-letterbox, square-expand
    to max side (detect.py:130-138), score gate 0.2 (detect.py:140);
  * classifier crop via affine from the ORIGINAL BGR frame
    (detect.py:92-117: /255 + ImageNet norm, no channel swap);
  * argmax label + heatmap argmax landmarks scaled back to frame coords
    (detect.py:149-157).

Where the reference round-trips host<->onnxruntime twice per frame with
numpy glue in between, here a single XLA graph takes the raw frame and
returns (label, score, box, landmarks); the host only draws and encodes.
"""

from __future__ import annotations

import dataclasses
import functools
import glob
import os
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hgr_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from hgr_tpu.models import MultiTaskNet
from hgr_tpu.models.multitasknet import heatmaps_to_nchw
from hgr_tpu.models.yolo import YOLOv7Tiny, best_box, decode_predictions
from hgr_tpu.ops.affine import build_affine
from hgr_tpu.ops.heatmap import get_max_preds
from hgr_tpu.ops.resize import resize_bilinear
from hgr_tpu.ops.warp import batched_affine_warp

Array = jax.Array


def letterbox_params(h: int, w: int, new: int) -> Tuple[float, float, float,
                                                        int, int]:
    """Static letterbox geometry (reference detect.py:15-45, auto=False):
    returns (r, dw, dh, new_unpad_w, new_unpad_h)."""
    r = min(new / h, new / w)
    new_unpad = (int(round(w * r)), int(round(h * r)))
    dw = (new - new_unpad[0]) / 2
    dh = (new - new_unpad[1]) / 2
    return r, dw, dh, new_unpad[0], new_unpad[1]


class HandGesturePipeline:
    """Holds both models' variables and the jitted per-frame graph."""

    def __init__(
        self,
        classifier_variables: Dict[str, Any],
        detector_variables: Dict[str, Any],
        class_names: Dict[str, int],
        det_img_size: int = 416,
        cls_img_size: Tuple[int, int] = (192, 192),
        score_thresh: float = 0.2,
        dtype=jnp.bfloat16,
    ):
        self.classifier = MultiTaskNet(dtype=dtype,
                                       image_size=cls_img_size)
        self.detector = YOLOv7Tiny(num_classes=1, dtype=dtype)
        self.cls_vars = classifier_variables
        self.det_vars = detector_variables
        self.det_img_size = det_img_size
        self.cls_img_size = cls_img_size
        self.score_thresh = score_thresh
        self.id_to_name = {v: k for k, v in class_names.items()}

    @functools.lru_cache(maxsize=8)
    def _compiled(self, frame_h: int, frame_w: int):
        """Build + jit the fused graph for one frame geometry."""
        det = self.det_img_size
        r, dw, dh, uw, uh = letterbox_params(frame_h, frame_w, det)
        top = int(round(dh - 0.1))
        left = int(round(dw - 0.1))
        cls_h, cls_w = self.cls_img_size

        def run(frame_bgr_u8: Array):
            frame = frame_bgr_u8.astype(jnp.float32)  # (H, W, 3) BGR

            # --- detection pre-process (RGB, letterbox, /255) ---
            rgb = frame[..., ::-1]
            resized = resize_bilinear(rgb, (uh, uw))
            canvas = jnp.full((det, det, 3), 114.0)
            canvas = jax.lax.dynamic_update_slice(
                canvas, resized, (top, left, 0))
            det_in = (canvas / 255.0)[None]

            outs = self.detector.apply(self.det_vars, det_in, train=False)
            decoded = decode_predictions(outs, num_classes=1)
            boxes, scores = best_box(decoded)
            box = boxes[0]  # (4,) xyxy in letterbox coords
            score = scores[0]

            # --- un-letterbox + square expand (detect.py:130-138) ---
            box = box - jnp.array([dw, dh, dw, dh])
            box = box / r
            box = jnp.round(box)
            side = jnp.maximum(box[2] - box[0], box[3] - box[1])
            cx = (box[0] + box[2]) / 2.0
            cy = (box[1] + box[3]) / 2.0
            corner = jnp.stack([cx - side / 2.0, cy - side / 2.0])

            # --- classification crop (detect.py:92-117) ---
            m = build_affine(
                jnp.stack([cx, cy]), 1.0, 0.0, side,
                (float(cls_w), float(cls_h)))
            crop = batched_affine_warp(frame[None], m[None], (cls_h, cls_w))
            crop = crop / 255.0
            mean = jnp.asarray(IMAGENET_MEAN)
            std = jnp.asarray(IMAGENET_STD)
            cls_in = (crop - mean) / std

            logits, hmap, _ = self.classifier.apply(
                self.cls_vars, cls_in, train=False)
            label = jnp.argmax(logits[0])
            hmap_nchw = heatmaps_to_nchw(hmap)
            lm, _ = get_max_preds(hmap_nchw)
            lm = lm[0]  # (J, 2) in heatmap pixels
            hm_h, hm_w = hmap_nchw.shape[-2:]
            lm = lm / jnp.array([hm_w, hm_h]) * side + corner

            return label, score, box, lm

        return jax.jit(run)

    def infer_frame(self, frame_bgr: np.ndarray):
        """Run one (H, W, 3) BGR uint8 frame. Returns dict or None when
        the detection score fails the 0.2 gate (reference detect.py:140)."""
        h, w = frame_bgr.shape[:2]
        fn = self._compiled(h, w)
        label, score, box, lm = fn(jnp.asarray(frame_bgr))
        if float(score) <= self.score_thresh:
            return None
        return {
            "label": int(label),
            "label_name": self.id_to_name.get(int(label), str(int(label))),
            "score": float(score),
            "box": np.asarray(box, np.int32),
            "landmarks": np.asarray(lm, np.int32),
        }

    def annotate(self, frame_bgr: np.ndarray, result) -> np.ndarray:
        """Draw skeleton + bbox + label (reference detect.py:159-167)."""
        if result is None:
            return frame_bgr
        from hgr_tpu.utils.draw import draw_bones, draw_joints

        frame = draw_bones(frame_bgr, result["landmarks"])
        frame = draw_joints(frame, result["landmarks"])
        try:
            import cv2

            b = result["box"]
            frame = cv2.rectangle(frame, (int(b[0]), int(b[1])),
                                  (int(b[2]), int(b[3])), (0, 255, 0), 2)
            frame = cv2.putText(
                frame, "Prediction: {}".format(result["label_name"]),
                (int(b[0]), int(b[1]) - 10), cv2.FONT_HERSHEY_SIMPLEX, 1,
                (0, 255, 0), 2)
        except ImportError:
            pass
        return frame


def iter_frames(data_path: str) -> Iterator[np.ndarray]:
    """Video file or directory of images (reference detect.py:179-205)."""
    if os.path.isfile(data_path):
        import cv2

        cap = cv2.VideoCapture(data_path)
        if not cap.isOpened():
            raise IOError("Error opening video file")
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            yield frame
        cap.release()
    else:
        files = sorted(glob.glob(os.path.join(data_path, "*.png")))
        files += sorted(glob.glob(os.path.join(data_path, "*.jpg")))
        for f in files:
            try:
                import cv2

                yield cv2.imread(f)
            except ImportError:
                from PIL import Image

                yield np.asarray(Image.open(f).convert("RGB"))[..., ::-1]


def detect_to_video(
    pipeline: HandGesturePipeline,
    data_path: str,
    save_path: str,
    fps: float = 30.0,
    out_size: Tuple[int, int] = (640, 360),
) -> int:
    """Process a video/images into an annotated mp4
    (reference detect.py:171-207). Returns frames processed."""
    import cv2

    writer = cv2.VideoWriter(
        save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, out_size)
    n = 0
    for frame in iter_frames(data_path):
        result = pipeline.infer_frame(frame)
        frame = pipeline.annotate(frame, result)
        if (frame.shape[1], frame.shape[0]) != out_size:
            frame = cv2.resize(frame, out_size)
        writer.write(frame)
        n += 1
    writer.release()
    return n
