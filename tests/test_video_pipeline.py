"""detect_to_video's overlapped decode -> dispatch -> encode pipeline
(hgr_tpu/infer/detect.py). Reference counterpart: the frame-serial loop
at detect.py:171-207 — these tests pin that the overlapped version
keeps its ordering/semantics."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hgr_tpu.infer.detect import detect_to_video, iter_frames


class StubPipeline:
    """dispatch/finish/annotate with recorded call order; stamps each
    frame's mean so output order is checkable."""

    def __init__(self):
        self.dispatched = []
        self.finished = []

    def dispatch_frames(self, frames):
        self.dispatched.append(frames.shape)
        return ("handle", frames)

    def finish_frames(self, handle):
        _, frames = handle
        self.finished.append(frames.shape)
        return [{"label": int(f[0, 0, 0])} for f in frames]

    def annotate(self, frame, result):
        out = frame.copy()
        out[0, 0, 0] = result["label"]
        return out


def _write_frames(tmpdir, values, size=(32, 48)):
    for i, v in enumerate(values):
        img = np.full(size + (3,), v, np.uint8)
        cv2.imwrite(os.path.join(tmpdir, f"f_{i:03d}.png"), img)


def test_video_pipeline_order_and_count(tmp_path):
    vals = list(range(1, 11))
    _write_frames(str(tmp_path), vals)
    pipe = StubPipeline()
    out = str(tmp_path / "out.mp4")
    n = detect_to_video(pipe, str(tmp_path), out, batch_frames=3,
                        out_size=(48, 32), pipeline_depth=2)
    assert n == 10
    assert os.path.exists(out)
    # 10 frames at batch 3 -> chunks of 3,3,3,1, dispatched in order
    assert [s[0] for s in pipe.dispatched] == [3, 3, 3, 1]
    assert pipe.finished == pipe.dispatched  # FIFO completion


def test_video_pipeline_geometry_split(tmp_path):
    # two geometries interleave a chunk boundary
    _write_frames(str(tmp_path), [1, 2], size=(32, 48))
    for i, v in enumerate([3, 4, 5]):
        img = np.full((64, 48, 3), v, np.uint8)
        cv2.imwrite(os.path.join(str(tmp_path), f"g_{i:03d}.png"), img)
    pipe = StubPipeline()
    n = detect_to_video(pipe, str(tmp_path), str(tmp_path / "o.mp4"),
                        batch_frames=4, out_size=(48, 32))
    assert n == 5
    # sorted order: f_* (32x48) then g_* (64x48); geometry change forces
    # a flush of the first chunk before batch_frames is reached
    assert [(s[0], s[1]) for s in pipe.dispatched] == [(2, 32), (3, 64)]


def test_video_pipeline_decode_error_propagates(tmp_path):
    _write_frames(str(tmp_path), [1, 2])
    bad = os.path.join(str(tmp_path), "z_bad.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    pipe = StubPipeline()
    with pytest.raises(ValueError, match="Fail to read"):
        detect_to_video(pipe, str(tmp_path), str(tmp_path / "o.mp4"),
                        batch_frames=8)


def test_iter_frames_dir_reads_sorted(tmp_path):
    _write_frames(str(tmp_path), [7, 9, 11])
    frames = list(iter_frames(str(tmp_path)))
    assert [int(f[0, 0, 0]) for f in frames] == [7, 9, 11]
