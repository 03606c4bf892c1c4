"""End-to-end test of the dataset extraction tool (VERDICT r1 #2):
raw-HaGRID-format fixture -> extract (fake estimator, no mediapipe) ->
the extracted layout must be exactly what data.dataset.read_annotations
consumes (reference extract_data.py:99-107,152-165 -> libs/load.py:208-228),
and the staged batch must carry the landmarks through.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hgr_tpu.data.dataset import read_annotations  # noqa: E402
from hgr_tpu.data.loader import BatchLoader  # noqa: E402
from hgr_tpu.tools.extract_data import (  # noqa: E402
    HagridDataExtractor,
    calculate_iou,
)


class FakeEstimator:
    """Deterministic stand-in for MediaPipe: 21 landmarks spread inside
    a fixed region, with a matching bbox."""

    def __init__(self, region):
        self.region = region  # (x, y, w, h) pixels

    def __call__(self, img_bgr):
        x, y, w, h = self.region
        xs = np.linspace(x + 2, x + w - 2, 21)
        ys = np.linspace(y + 2, y + h - 2, 21)
        joints = np.stack([xs, ys], axis=-1)[None]  # (1, 21, 2)
        return joints, [[x, y, w, h]]


def _make_raw_hagrid(root, gestures=("call", "like"), n_imgs=3,
                     img_size=96):
    """Raw HaGRID layout: <root>/<gesture>/<id>.jpg +
    <root>/annotations/<split>/<gesture>.json with normalized bboxes."""
    region = (24, 24, 48, 48)
    for g in gestures:
        os.makedirs(os.path.join(root, g), exist_ok=True)
        annots = {}
        for i in range(n_imgs):
            img_id = f"{g}_img{i}"
            rng = np.random.RandomState(hash((g, i)) % 2**31)
            img = rng.randint(0, 255, (img_size, img_size, 3), np.uint8)
            cv2.imwrite(os.path.join(root, g, img_id + ".jpg"), img)
            annots[img_id] = {
                "bboxes": [[region[0] / img_size, region[1] / img_size,
                            region[2] / img_size, region[3] / img_size]],
                "labels": [g],
            }
        for split in ("train", "val"):
            d = os.path.join(root, "annotations", split)
            os.makedirs(d, exist_ok=True)
        with open(os.path.join(root, "annotations", "train",
                               f"{g}.json"), "w") as f:
            json.dump(annots, f)
    return region


def test_iou_matching_threshold():
    assert calculate_iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert calculate_iou([0, 0, 10, 10], [20, 20, 5, 5]) == 0.0
    assert 0.0 < calculate_iou([0, 0, 10, 10], [5, 0, 10, 10]) < 0.5


def test_extract_roundtrip(tmp_path):
    root = str(tmp_path / "raw")
    out = str(tmp_path / "extracted")
    region = _make_raw_hagrid(root)

    extractor = HagridDataExtractor(
        root, out, estimator=FakeEstimator(region), num_workers=2)
    extractor.extract("annotations/train")

    # layout: annotations/<SPLIT>/<gesture>.json (the r1 bug wrote
    # annotations/<gesture>/<gesture>.json, unreadable by the dataset)
    for g in ("call", "like"):
        ann = os.path.join(out, "annotations", "train", f"{g}.json")
        assert os.path.isfile(ann), ann
        with open(ann) as f:
            data = json.load(f)
        assert len(data) == 3
        for img_id, rec in data.items():
            # crops live at <out>/<gesture>/<image_id>.jpg, resolvable by
            # read_annotations' <json_dir>/../../<json_stem>/<id>.jpg rule
            crop = os.path.join(out, g, img_id + ".jpg")
            assert os.path.isfile(crop), crop
            assert rec["label"] == g
            lm = np.asarray(rec["landmark"])
            assert lm.shape == (21, 2)
            # landmarks normalized to the crop
            assert (lm >= -0.5).all() and (lm <= 1.5).all()

    # consumes straight through the dataset + loader
    names = {"call": 0, "like": 1}
    idx = read_annotations(os.path.join(out, "annotations", "train"), names)
    assert len(idx) == 6
    loader = BatchLoader(idx, batch_size=4, canvas_size=128, shuffle=False,
                         drop_last=False, num_workers=1)
    batch = next(iter(loader))
    assert batch["canvas"].shape == (4, 128, 128, 3)
    assert batch["joints_vis"].sum() == 4 * 21  # all landmarks present
    assert set(np.asarray(batch["label"]).tolist()) <= {0, 1}


def test_extract_unmatched_bbox_empty_landmarks(tmp_path):
    """GT bbox with no IoU>0.5 landmark gets an empty landmark list
    (reference behavior: joints stays (0, 2))."""
    root = str(tmp_path / "raw")
    out = str(tmp_path / "extracted")
    _make_raw_hagrid(root, gestures=("fist",), n_imgs=1)
    # estimator's landmarks live far away from the GT bbox
    extractor = HagridDataExtractor(
        root, out, estimator=FakeEstimator((0, 0, 8, 8)), num_workers=1)
    extractor.extract("annotations/train")
    with open(os.path.join(out, "annotations", "train", "fist.json")) as f:
        data = json.load(f)
    (rec,) = data.values()
    assert rec["landmark"] == []
