"""Backbone-variant autodetection from checkpoint trees.

GELAN small/large share every channel width and differ only in
blocks-per-chain (models/gelan.py GELAN_SPEC), so a large checkpoint
restores "cleanly" into a small model while flax silently ignores the
extra cv2_1/cv3_1 ResBlocks — wrong numbers with no error. The loaders
therefore detect the variant from the tree structure
(infer/weights.py:infer_backbone_variant) and every inference surface
(cli/export.py, cli/serve.py, HandGesturePipeline) resolves
'auto' through it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgr_tpu.infer.weights import (
    infer_backbone_variant,
    load_classifier_weights,
)
from hgr_tpu.models import MultiTaskNet

SIZE = (48, 48)


def _init(variant):
    model = MultiTaskNet(image_size=SIZE, backbone=variant,
                         dtype=jnp.float32)
    return model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1,) + SIZE + (3,)), train=False)


@pytest.fixture(scope="module")
def small_vars():
    return _init("small")


@pytest.fixture(scope="module")
def large_vars():
    return _init("large")


def test_variant_detected_from_structure(small_vars, large_vars):
    assert infer_backbone_variant(small_vars) == "small"
    assert infer_backbone_variant(large_vars) == "large"
    # bare params tree (no 'params' wrapper) works too
    assert infer_backbone_variant(large_vars["params"]) == "large"


def test_non_classifier_tree_rejected():
    with pytest.raises(ValueError, match="cspelan1"):
        infer_backbone_variant({"params": {"something": {}}})


def test_npz_roundtrip_auto_and_mismatch(tmp_path, large_vars):
    from hgr_tpu.infer.export import save_weights_npz

    path = str(tmp_path / "large.npz")
    save_weights_npz(large_vars, path)
    loaded = load_classifier_weights(path, SIZE)  # backbone='auto'
    assert infer_backbone_variant(loaded) == "large"
    # an explicit wrong flag is a hard error, not silent degradation
    with pytest.raises(ValueError, match="large"):
        load_classifier_weights(path, SIZE, backbone="small")


def test_orbax_auto_probes_large_template(tmp_path, large_vars):
    """Orbax restore needs a structurally matching template; 'auto'
    probes small then large, so a large checkpoint dir loads without
    any flag."""
    import orbax.checkpoint as ocp

    path = str(tmp_path / "ckpt_large")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(large_vars))
    ckptr.wait_until_finished()

    loaded = load_classifier_weights(path, SIZE)
    assert infer_backbone_variant(loaded) == "large"
    leaf = loaded["params"]["encoder"]["cspelan1"]["cv2_1"]["cv1"]["conv"][
        "kernel"]
    want = large_vars["params"]["encoder"]["cspelan1"]["cv2_1"]["cv1"][
        "conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(want))


def test_run_meta_absent_falls_back(tmp_path, small_vars):
    from hgr_tpu.infer.export import save_weights_npz
    from hgr_tpu.infer.weights import read_run_meta, resolve_image_size

    path = str(tmp_path / "bare.npz")
    save_weights_npz(small_vars, path)
    assert read_run_meta(path) is None
    assert resolve_image_size(path, None) == (192, 192)
    assert resolve_image_size("", None, default=SIZE) == SIZE


def test_run_meta_orders_orbax_probe(tmp_path, large_vars):
    """With run_meta.json recorded, the orbax 'auto' path probes the
    recorded variant first (one template init instead of a failed small
    probe)."""
    import json

    import orbax.checkpoint as ocp

    wdir = tmp_path / "weight"
    wdir.mkdir()
    path = str(wdir / "best")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(large_vars))
    ckptr.wait_until_finished()
    (wdir / "run_meta.json").write_text(json.dumps(
        {"backbone": "large", "image_size": list(SIZE)}))

    loaded = load_classifier_weights(path, SIZE)
    assert infer_backbone_variant(loaded) == "large"


def test_pipeline_auto_selects_large(large_vars):
    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.infer.detect import HandGesturePipeline
    from hgr_tpu.infer.weights import load_detector_weights

    pipe = HandGesturePipeline(
        large_vars, load_detector_weights("", det_img_size=160),
        DEFAULT_NAMES, det_img_size=160, cls_img_size=SIZE,
        dtype=jnp.float32)
    assert pipe.classifier.backbone == "large"
