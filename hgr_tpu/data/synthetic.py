"""Synthetic dataset fixture in the reference annotation format.

Generates hand-crop-like images (colored blobs + a drawn 5-chain skeleton)
with known landmarks and writes them as JPEGs + per-split JSON exactly as
``extract_data.py`` would (reference extract_data.py:152-165), so the full
reader -> pipeline -> train stack can be tested end-to-end without HaGRID
(SURVEY.md §4d).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from hgr_tpu.config import DEFAULT_NAMES

# 5-finger chain topology (reference libs/draw.py:5-9).
FINGER_CHAINS = [
    [0, 1, 2, 3, 4], [0, 5, 6, 7, 8], [0, 9, 10, 11, 12],
    [0, 13, 14, 15, 16], [0, 17, 18, 19, 20],
]


def make_hand_image(
    rng: np.random.RandomState,
    size: int = 224,
    num_joints: int = 21,
    blob_color: Optional[Sequence[int]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """One synthetic crop: background gradient + joint blobs.

    ``blob_color`` (BGR) keys the joint color; when the fixture derives it
    from the class label the classification task becomes genuinely
    learnable (used for convergence sanity runs).

    Returns (img uint8 (size, size, 3) BGR-ish, joints (J, 2) pixels).
    """
    img = np.zeros((size, size, 3), np.uint8)
    base = rng.randint(20, 120, 3)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for c in range(3):
        img[..., c] = np.clip(
            base[c] + 60 * yy + 40 * xx * rng.rand(), 0, 255).astype(np.uint8)

    # The training pipeline crops the CENTRAL 0.35*max(h,w) window
    # (reference libs/load.py:69-70), so the hand must fit inside the
    # central ~30%: wrist near center, finger reach <= 0.1*size.
    wrist = np.array([size * (0.47 + 0.06 * rng.rand()),
                      size * (0.5 + 0.06 * rng.rand())])
    joints = np.zeros((num_joints, 2), np.float32)
    joints[0] = wrist
    for f, chain in enumerate(FINGER_CHAINS):
        angle = np.deg2rad(-90 + (f - 2) * 18 + rng.randn() * 5)
        direction = np.array([np.cos(angle), np.sin(angle)])
        for k, j in enumerate(chain[1:], start=1):
            joints[j] = wrist + direction * size * 0.025 * k \
                + rng.randn(2) * 1.0
    joints = np.clip(joints, 2, size - 3)

    color = (list(blob_color) if blob_color is not None
             else rng.randint(120, 255, 3).tolist())
    for j in range(num_joints):
        x, y = int(joints[j, 0]), int(joints[j, 1])
        r = 4
        y0, y1 = max(0, y - r), min(size, y + r + 1)
        x0, x1 = max(0, x - r), min(size, x + r + 1)
        img[y0:y1, x0:x1] = color
    return img, joints


def write_synthetic_split(
    out_dir: str,
    split: str,
    num_images: int,
    names: Optional[Dict[str, int]] = None,
    image_size: int = 224,
    seed: int = 0,
) -> str:
    """Write ``<out_dir>/<split>/*.jpg`` + ``<out_dir>/annotations/<split>/
    <split>.json`` matching the reference layout (libs/load.py:208-228:
    images at json_path.parents[2]/<json_stem>/<image_id>.jpg).

    Returns the annotation directory path for this split.
    """
    names = names or DEFAULT_NAMES
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(out_dir, split)
    ann_dir = os.path.join(out_dir, "annotations", split)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    label_names = list(names.keys())
    annots = {}
    for i in range(num_images):
        label_id = i % len(label_names)
        # label-keyed blob color -> the class is recoverable from pixels
        # (channels offset by thirds of the hue wheel so the three BGR
        # values actually differ; ``(hue * 3 + k) % 1.0`` with integer k
        # was a no-op that collapsed every class to a gray level)
        hue = label_id / max(len(label_names), 1)
        blob = [int(60 + 195 * ((hue + k / 3.0) % 1.0)) for k in range(3)]
        img, joints = make_hand_image(rng, image_size, blob_color=blob)
        image_id = f"syn_{split}_{i:05d}"
        _write_jpeg(os.path.join(img_dir, image_id + ".jpg"), img)
        # Occasionally emit an empty landmark list (the reference format
        # allows it; load.py:84-86 handles it).
        if i % 17 == 16:
            landmark = []
        else:
            landmark = (joints / image_size).tolist()
        annots[image_id] = {
            "label": label_names[i % len(label_names)],
            "landmark": landmark,
        }
    with open(os.path.join(ann_dir, split + ".json"), "w") as f:
        json.dump(annots, f)
    return ann_dir


def _write_jpeg(path: str, img: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, img)
    except ImportError:
        from PIL import Image

        Image.fromarray(img[..., ::-1]).save(path, quality=95)
