"""End-to-end detection smoke: trained weights through the FULL fused
pipeline (letterbox -> yolov7-tiny -> decode -> best_box -> square-expand
-> crop -> classify), asserting the detector actually localizes.

The weights come from ``hgr_tpu.tools.train_detector_smoke`` (trained
from scratch on synthetic hand-box scenes, committed as a float16 npz
fixture). This is the evidence the ONNX-port parity test cannot give:
non-random weights driving the real serving graph on non-416 frames so
the un-letterbox arithmetic (reference detect.py:130-138) is exercised.

Skips when the fixture is absent (e.g. after a fresh clone with LFS-less
tooling) — regenerate with:
  python -m hgr_tpu.tools.train_detector_smoke
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "yolo_smoke_weights.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="trained smoke weights not present; run "
           "hgr_tpu.tools.train_detector_smoke")


def _frames(n: int, fh: int = 480, fw: int = 640):
    """Non-square frames with one synthetic hand each (deterministic)."""
    from hgr_tpu.tools.train_detector_smoke import make_scene

    rng = np.random.RandomState(123)
    frames = np.full((n, fh, fw, 3), 0, np.uint8)
    gts = np.zeros((n, 4), np.float32)
    for i in range(n):
        # shrink_prob off: the 480x640 placement already letterbox-
        # shrinks the scene by 416/640 = 0.65 in the serving graph
        scene, gt = make_scene(rng, size=416, pad_prob=0.0,
                               shrink_prob=0.0)
        # place the 416-square scene inside the 480x640 frame
        oy = (fh - 416) // 2
        ox = (fw - 416) // 2
        bg = np.clip(rng.randint(30, 160, 3)[None, None]
                     + rng.randn(fh, fw, 3) * 8, 0, 255).astype(np.uint8)
        frames[i] = bg
        frames[i, oy:oy + 416, ox:ox + 416] = scene
        gts[i] = gt + np.array([ox, oy, 0, 0], np.float32)
    return frames, gts


def _iou(a, b):
    lt = np.maximum(a[..., :2], b[..., :2])
    rb = np.minimum(a[..., 2:], b[..., 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


def test_trained_detector_localizes_through_full_pipeline():
    import jax

    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.infer.detect import HandGesturePipeline
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.models.yolo import load_npz_weights

    det_vars = load_npz_weights(FIXTURE)
    det_vars = jax.tree.map(lambda x: np.asarray(x, np.float32), det_vars)

    cls_model = MultiTaskNet()
    cls_vars = cls_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 192, 192, 3)), train=False)

    pipe = HandGesturePipeline(cls_vars, det_vars, DEFAULT_NAMES,
                               score_thresh=0.2)
    n = 6
    frames, gts = _frames(n)
    results = pipe.infer_frames(frames)

    gt_xyxy = np.stack(
        [gts[:, 0] - gts[:, 2] / 2, gts[:, 1] - gts[:, 3] / 2,
         gts[:, 0] + gts[:, 2] / 2, gts[:, 1] + gts[:, 3] / 2], axis=-1)
    hits = 0
    for i, res in enumerate(results):
        if res is None:
            continue
        # result["box"] is the un-letterboxed detector box in frame
        # space (detect graph pre-square-expand); the synthetic hand is
        # square so IoU against the square GT is direct
        iou = _iou(np.asarray(res["box"], np.float32), gt_xyxy[i])
        if iou > 0.5:
            hits += 1
    # trained-from-scratch toy detector: demand a solid majority
    assert hits >= n - 1, (
        f"only {hits}/{n} frames localized with IoU>0.5: "
        f"{[None if r is None else r['box'].tolist() for r in results]}")
