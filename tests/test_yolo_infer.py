"""Detector + fused inference pipeline + export tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.config import DEFAULT_NAMES
from hgr_tpu.models.yolo import (
    ANCHORS,
    STRIDES,
    YOLOv7Tiny,
    best_box,
    decode_predictions,
    nms,
)

DET = 224  # small multiple of 32 for fast tests


@pytest.fixture(scope="module")
def yolo_and_vars():
    model = YOLOv7Tiny(num_classes=1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, DET, DET, 3)), train=False)
    return model, variables


def test_yolo_output_shapes(yolo_and_vars):
    model, variables = yolo_and_vars
    outs = model.apply(variables, jnp.zeros((2, DET, DET, 3)), train=False)
    assert len(outs) == 3
    for o, stride in zip(outs, STRIDES):
        assert o.shape == (2, DET // stride, DET // stride, 3 * 6)


def test_decode_geometry(yolo_and_vars):
    """Zero logits decode to anchor-centered boxes at every grid cell."""
    shapes = [(1, DET // s, DET // s, 18) for s in STRIDES]
    outs = [jnp.zeros(s) for s in shapes]
    decoded = decode_predictions(outs, num_classes=1)
    n_total = sum(3 * (DET // s) ** 2 for s in STRIDES)
    assert decoded.shape == (1, n_total, 6)
    d = np.asarray(decoded[0])
    # sigmoid(0)=0.5 -> xy = (2*0.5-0.5+grid)*stride = (grid+0.5)*stride
    # first row: scale stride 8, grid (0,0), anchor (10,13)
    np.testing.assert_allclose(d[0, :2], [0.5 * 8, 0.5 * 8], rtol=1e-5)
    np.testing.assert_allclose(d[0, 2:4], [10.0, 13.0], rtol=1e-5)  # (2*0.5)^2*a
    np.testing.assert_allclose(d[:, 4], 0.5)  # sigmoid(0) objness


def test_best_box_selects_highest_score():
    decoded = np.zeros((1, 10, 6), np.float32)
    decoded[:, :, 4] = 0.1
    decoded[:, :, 5] = 0.5
    decoded[0, 3] = [100, 80, 40, 20, 0.9, 0.8]  # winner
    boxes, scores = best_box(jnp.asarray(decoded))
    np.testing.assert_allclose(np.asarray(scores[0]), 0.72, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(boxes[0]), [80, 70, 120, 90],
                               rtol=1e-5)


def test_nms_suppresses_overlaps():
    decoded = np.zeros((1, 6, 6), np.float32)
    # two heavily overlapping boxes + one distinct
    decoded[0, 0] = [50, 50, 20, 20, 0.9, 0.9]
    decoded[0, 1] = [52, 51, 20, 20, 0.8, 0.9]  # overlaps 0 -> suppressed
    decoded[0, 2] = [150, 150, 30, 30, 0.7, 0.9]
    boxes, scores, classes = nms(jnp.asarray(decoded), score_thresh=0.1,
                                 max_det=6)
    s = np.asarray(scores[0])
    kept = (s > 0).sum()
    assert kept == 2, s
    # slots are score-ordered; suppressed slots zero in place
    assert s[0] > 0 and s[2] > 0 and s[1] == 0
    np.testing.assert_allclose(np.asarray(boxes[0, 0]), [40, 40, 60, 60])


def test_nms_keeps_separate_classes():
    decoded = np.zeros((1, 4, 7), np.float32)  # 2 classes
    decoded[0, 0] = [50, 50, 20, 20, 0.9, 0.9, 0.0]
    decoded[0, 1] = [51, 51, 20, 20, 0.85, 0.0, 0.9]  # other class, kept
    boxes, scores, classes = nms(jnp.asarray(decoded), score_thresh=0.1,
                                 max_det=4)
    assert (np.asarray(scores[0]) > 0).sum() == 2


def test_fused_pipeline_smoke():
    """The full detect->crop->classify graph compiles and runs on one
    frame with random weights."""
    from hgr_tpu.infer.detect import HandGesturePipeline
    from hgr_tpu.infer.weights import (
        load_classifier_weights,
        load_detector_weights,
    )

    cls_vars = load_classifier_weights("", image_size=(64, 64))
    det_vars = load_detector_weights("", det_img_size=160)
    pipe = HandGesturePipeline(
        cls_vars, det_vars, DEFAULT_NAMES, det_img_size=160,
        cls_img_size=(64, 64), score_thresh=-1.0, dtype=jnp.float32)

    frame = np.random.RandomState(0).randint(
        0, 255, (180, 320, 3), np.uint8)
    result = pipe.infer_frame(frame)
    assert result is not None
    assert 0 <= result["label"] < 19
    assert result["landmarks"].shape == (21, 2)
    assert result["box"].shape == (4,)
    annotated = pipe.annotate(frame.copy(), result)
    assert annotated.shape == frame.shape

    # score gate: with an impossible threshold nothing is returned
    pipe.score_thresh = 2.0
    assert pipe.infer_frame(frame) is None


def test_letterbox_params_match_reference():
    from hgr_tpu.infer.detect import letterbox_params

    # reference letterbox (detect.py:15-45) with auto=False, 416
    for h, w in [(360, 640), (480, 640), (640, 480), (416, 416)]:
        r, dw, dh, uw, uh = letterbox_params(h, w, 416)
        r_ref = min(416 / h, 416 / w)
        assert abs(r - r_ref) < 1e-9
        assert uw == int(round(w * r_ref))
        assert uh == int(round(h * r_ref))
        assert abs(dw - (416 - uw) / 2) < 1e-9
        assert abs(dh - (416 - uh) / 2) < 1e-9


def test_export_roundtrip(tmp_path):
    """StableHLO export -> deserialize -> same outputs as live apply."""
    from hgr_tpu.infer.export import (
        export_stablehlo,
        load_stablehlo,
        load_weights_npz,
        save_weights_npz,
    )
    from hgr_tpu.models import MultiTaskNet

    model = MultiTaskNet(image_size=(64, 64))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    path = str(tmp_path / "model.stablehlo")
    export_stablehlo(model, variables, path, batch=2)
    fn = load_stablehlo(path)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)
    logits_e, hmap_e = fn(x)
    logits, hmap, _ = model.apply(variables, x, train=False)
    from hgr_tpu.models.multitasknet import heatmaps_to_nchw

    np.testing.assert_allclose(np.asarray(logits_e), np.asarray(logits),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hmap_e),
                               np.asarray(heatmaps_to_nchw(hmap)),
                               atol=1e-5)

    # weights bundle roundtrip
    npz = str(tmp_path / "w.npz")
    save_weights_npz(variables, npz)
    back = load_weights_npz(npz)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
