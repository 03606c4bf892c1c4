"""ONNX export of the classifier (hgr_tpu/infer/onnx_export.py).

Parity chain: Flax MultiTaskNet -> functional torch mirror (numeric
equality here) -> torch.onnx.export (the toolchain the reference used,
reference export.py:72-78) -> first-party wire-reader parse of the
emitted file (graph inventory + initializer round-trip).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hgr_tpu.infer.onnx_export import TorchMirror, export_onnx
from hgr_tpu.models import MultiTaskNet
from hgr_tpu.models.multitasknet import heatmaps_to_nchw

HIGH = jax.lax.Precision.HIGHEST


@pytest.fixture(scope="module")
def model_and_vars():
    model = MultiTaskNet(dtype=jnp.float32, precision=HIGH,
                         fused_attention=False)
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, 192, 192, 3)), train=False)
    return model, variables


def _forward_both(model, variables, batch=2, seed=0):
    x = np.random.RandomState(seed).rand(batch, 3, 192, 192).astype(
        np.float32)
    logits_j, hmap_j, _ = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
        need_attnmap=False)
    hmap_j = heatmaps_to_nchw(hmap_j)
    mirror = TorchMirror(variables, backbone=model.backbone)
    with torch.no_grad():
        logits_t, hmap_t = mirror(torch.from_numpy(x))
    return (np.asarray(logits_j), np.asarray(hmap_j),
            logits_t.numpy(), hmap_t.numpy())


def test_mirror_matches_flax(model_and_vars):
    """The torch mirror must reproduce the Flax forward (~1e-4 f32 —
    the same tolerance the torch->flax weight-port parity test uses)."""
    model, variables = model_and_vars
    lj, hj, lt, ht = _forward_both(model, variables)
    np.testing.assert_allclose(lt, lj, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(ht, hj, rtol=1e-3, atol=1e-4)


def test_export_artifact_parses(model_and_vars, tmp_path):
    """torch.onnx.export must emit a file our first-party wire reader
    can parse, with the reference's 2-output graph shape."""
    from hgr_tpu.utils.onnx_reader import load_onnx_graph

    _model, variables = model_and_vars
    path = str(tmp_path / "classifier.onnx")
    export_onnx(variables, path)

    graph = load_onnx_graph(path)
    ops = [n.op_type for n in graph.nodes]
    # GELAN small: 22 backbone convs + proj + pose-head 1x1 = 24
    # (model topology per hgr_tpu/models/gelan.py; reference
    # model/gelan.py:145-176 + multitasknet.py:13 + transformer.py:150).
    assert ops.count("Conv") == 24
    # torch's exporter folds eval-mode BN into the conv weights
    # (the same deploy-graph convention as yolov7's .fuse() artifact)
    assert ops.count("BatchNormalization") == 0
    assert ops.count("Softmax") == 4  # one per transformer layer
    assert "Resize" in ops or "Upsample" in ops  # align-corners x4
    # reference export signature: exactly the 2 deploy outputs
    # (export.py:43-45 drops the attention map).
    produced = {o for n in graph.nodes for o in n.outputs}
    assert {"label_pred", "heatmap_pred"} <= produced

    # initializer round-trip: the BN-folded stem kernel must be in the
    # file with the torch (O, I, kh, kw) layout and our values. At init
    # the BN stats are identity (scale 1, var 1, mean 0, bias 0), so the
    # folded kernel is W/sqrt(1+eps) ~= W. (proj/pose kernels are traced
    # as Constant nodes, not initializers — only constant-folding
    # products land in the initializer table.)
    stem = np.asarray(
        variables["params"]["encoder"]["conv1"]["conv"]["kernel"])
    want = stem.transpose(3, 2, 0, 1)  # (64, 3, 3, 3)
    found = any(
        t.to_numpy().shape == want.shape
        and np.allclose(t.to_numpy(), want, atol=1e-4)
        for t in graph.initializers.values()
        if t.to_numpy().size == want.size)
    assert found, "BN-folded stem kernel not found among initializers"


def test_export_large_backbone_builds(tmp_path):
    """The 'large' spec (2 blocks per chain) exports too."""
    model = MultiTaskNet(dtype=jnp.float32, backbone="large",
                         precision=HIGH, fused_attention=False)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 192, 192, 3)), train=False)
    lj, hj, lt, ht = _forward_both(model, variables, batch=1, seed=3)
    np.testing.assert_allclose(lt, lj, rtol=1e-3, atol=1e-4)

    path = str(tmp_path / "classifier_large.onnx")
    export_onnx(variables, path, backbone="large")
    from hgr_tpu.utils.onnx_reader import load_onnx_graph

    graph = load_onnx_graph(path)
    # large: each chain has 2 ResBasicBlocks -> 4 extra convs per
    # GELAN block -> 24 + 12 = 36
    assert [n.op_type for n in graph.nodes].count("Conv") == 36
