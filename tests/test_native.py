"""Native C++ runtime tests: JPEG decode parity with cv2, staging parity
with the Python path, and the loader fast path. Skipped when the
toolchain/library is unavailable.
"""

import numpy as np
import pytest

from hgr_tpu.data import native
from hgr_tpu.data.pipeline import stage_image
from hgr_tpu.data.synthetic import _write_jpeg, make_hand_image

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def jpgs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, size in enumerate([200, 300, 500]):  # 500 > canvas -> downscale
        img, _ = make_hand_image(rng, size)
        p = str(d / f"img_{i}.jpg")
        _write_jpeg(p, img)
        paths.append(p)
    return paths


def test_decode_matches_cv2(jpgs):
    for p in jpgs:
        ref = cv2.imread(p)
        got = native.decode_jpeg_bgr(p)
        assert got is not None
        # both use libjpeg; identical output expected
        np.testing.assert_array_equal(got, ref)


def test_decode_missing_file():
    assert native.decode_jpeg_bgr("/nonexistent/file.jpg") is None


def test_decode_bytes_matches_file(jpgs):
    """In-memory decode (serving ingest path, cli/serve.py) is identical
    to file decode and to cv2.imdecode."""
    for p in jpgs:
        with open(p, "rb") as f:
            data = f.read()
        got = native.decode_jpeg_bgr_bytes(data)
        assert got is not None
        np.testing.assert_array_equal(got, native.decode_jpeg_bgr(p))
        np.testing.assert_array_equal(
            got, cv2.imdecode(np.frombuffer(data, np.uint8),
                              cv2.IMREAD_COLOR))


def test_decode_bytes_garbage():
    assert native.decode_jpeg_bgr_bytes(b"\xff\xd8\xffgarbage") is None


def test_stage_batch_matches_python(jpgs):
    res = native.stage_batch(jpgs, 256, num_threads=3)
    assert res is not None
    canvases, affines, sizes, ok = res
    assert ok.all()
    for i, p in enumerate(jpgs):
        img = cv2.imread(p)
        pc, pa, (h, w) = stage_image(img, 256)
        np.testing.assert_allclose(affines[i], pa, atol=1e-5)
        assert sizes[i].tolist() == [h, w]
        diff = np.abs(canvases[i].astype(int) - pc.astype(int))
        # windowed copies are exact; downscaled ones may differ by 1 LSB
        # (cv2 fixed-point vs our float bilinear)
        assert diff.mean() < 0.6
        assert np.percentile(diff, 99) <= 2


def test_loader_uses_native(jpgs, tmp_path):
    """BatchLoader fast path produces the same batch as the python path."""
    import json
    import os

    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.data.dataset import read_annotations
    from hgr_tpu.data.loader import BatchLoader

    # reference layout: root/<name>/<id>.jpg + root/annotations/<name>/<name>.json
    root = tmp_path / "ds"
    img_dir = root / "train"
    ann_dir = root / "annotations" / "train"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    annots = {}
    rng = np.random.RandomState(1)
    for i in range(4):
        img, joints = make_hand_image(rng, 220)
        iid = f"s{i}"
        _write_jpeg(str(img_dir / f"{iid}.jpg"), img)
        annots[iid] = {"label": list(DEFAULT_NAMES)[i],
                       "landmark": (joints / 220).tolist()}
    with open(ann_dir / "train.json", "w") as f:
        json.dump(annots, f)

    idx = read_annotations(str(ann_dir), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=4, canvas_size=256, shuffle=False,
                        num_workers=2)
    batch = next(iter(loader))
    ids = np.arange(4)
    native_ok = loader._native_batch(ids, {
        "canvas": np.zeros((4, 256, 256, 3), np.uint8),
        "orig_to_canvas": np.zeros((4, 2, 3), np.float32),
        "sizes_hw": np.zeros((4, 2), np.float32),
        "joints": np.zeros((4, 21, 2), np.float32),
        "joints_vis": np.zeros((4, 21), np.float32),
        "label": np.zeros((4,), np.int32),
    })
    assert native_ok
    # and the normal iteration used it too (canvas identical to direct
    # python staging)
    img0 = cv2.imread(idx.samples[0].image_path)
    pc, pa, _ = stage_image(img0, 256)
    np.testing.assert_array_equal(batch["canvas"][0], pc)
    np.testing.assert_allclose(batch["orig_to_canvas"][0], pa, atol=1e-5)
    assert batch["joints_vis"][0].sum() == 21


def test_loader_falls_back_on_undecodable_file(tmp_path):
    """A corrupt JPEG makes the native batch path report failure; the
    loader falls back to the python path, which raises a clear error for
    the unreadable file (reference load.py:59-60 parity)."""
    import json

    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.data.dataset import read_annotations
    from hgr_tpu.data.loader import BatchLoader

    root = tmp_path / "ds"
    img_dir = root / "train"
    ann_dir = root / "annotations" / "train"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    annots = {}
    for i in range(2):
        img, joints = make_hand_image(rng, 128)
        _write_jpeg(str(img_dir / f"s{i}.jpg"), img)
        annots[f"s{i}"] = {"label": "call",
                           "landmark": (joints / 128).tolist()}
    # corrupt the second file
    (img_dir / "s1.jpg").write_bytes(b"not a jpeg at all")
    with open(ann_dir / "train.json", "w") as f:
        json.dump(annots, f)

    idx = read_annotations(str(ann_dir), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=2, canvas_size=128, shuffle=False,
                         num_workers=2)
    with pytest.raises(ValueError, match="Fail to read"):
        list(loader)
