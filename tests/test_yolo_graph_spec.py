"""Pin every yolov7-tiny representation to the committed graph spec.

VERDICT r2 Missing #2: the torch parity oracle (helpers_yolo_torch.SPEC)
and the port order (onnx_port.CONV_ORDER) were written by the same hand
as the module under test — a shared transcription error would keep them
agreeing while both deviate from the real published graph. This test
pins all three against ``hgr_tpu/models/yolov7_tiny_graph.json`` (a
machine-readable re-derivation of the public yolov7-tiny.yaml) and
checks the spec is INTERNALLY consistent: channel flow, stride flow and
head geometry must close — a transcription typo in channels/strides/
topology breaks closure instead of propagating silently.
"""

import json
import os

import numpy as np
import pytest

GRAPH_JSON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hgr_tpu", "models", "yolov7_tiny_graph.json")

with open(GRAPH_JSON) as f:
    GRAPH = json.load(f)


def _resolve(frm, i):
    if isinstance(frm, list):
        return [j if j >= 0 else i + j for j in frm]
    return [frm if frm >= 0 else i + frm]


def test_spec_channel_and_stride_flow_close():
    """Walking the JSON graph must reproduce every declared c1 and land
    the three head layers at strides 8/16/32 with 64/128/256 channels."""
    ch = {-1: 3}  # node -1 := network input
    stride = {-1: 1}
    for node in GRAPH["nodes"]:
        i = node["i"]
        srcs = _resolve(node["from"], i)
        in_ch = sum(ch[s] for s in srcs)
        in_stride = stride[srcs[0]]
        assert all(stride[s] == in_stride for s in srcs), f"node {i}"
        if node["op"] == "Conv":
            assert in_ch == node["c1"], (
                f"node {i} ({node['flax']}): declared c1={node['c1']} "
                f"but graph flow gives {in_ch}")
            ch[i] = node["c2"]
            stride[i] = in_stride * node["s"]
        elif node["op"] == "Concat":
            ch[i] = in_ch
            stride[i] = in_stride
        elif node["op"] == "MP":
            ch[i] = in_ch
            stride[i] = in_stride * 2
        elif node["op"] == "SP":
            ch[i] = in_ch
            stride[i] = in_stride
        elif node["op"] == "Up":
            ch[i] = in_ch
            assert in_stride % 2 == 0
            stride[i] = in_stride // 2
        else:  # pragma: no cover
            raise AssertionError(node["op"])

    heads = GRAPH["head_layers"]
    assert [stride[h] for h in heads] == GRAPH["strides"] == [8, 16, 32]
    # head convs read P3/P4/P5 ELAN outputs and double their width
    assert [GRAPH["nodes"][h]["c1"] for h in heads] == [64, 128, 256]
    assert ([GRAPH["nodes"][h]["c2"] for h in heads]
            == GRAPH["detect"]["in_channels"] == [128, 256, 512])


def test_conv_order_matches_graph():
    from hgr_tpu.utils.onnx_port import CONV_ORDER, DETECT_CONVS

    json_order = [n["flax"] for n in GRAPH["nodes"] if n["op"] == "Conv"]
    assert json_order == CONV_ORDER, (
        "onnx_port.CONV_ORDER deviates from the committed graph spec")
    assert len(json_order) + len(DETECT_CONVS) == 58  # the 58-conv graph
    assert DETECT_CONVS == GRAPH["detect"]["flax"]


def test_anchors_and_strides_match_graph():
    from hgr_tpu.models.yolo import ANCHORS, BN_EPS, STRIDES

    assert [list(map(list, s)) for s in np.asarray(ANCHORS).tolist()] \
        == GRAPH["anchors"]
    assert list(STRIDES) == GRAPH["strides"]
    assert BN_EPS == GRAPH["bn"]["eps"]


def test_torch_oracle_matches_graph():
    """helpers_yolo_torch.SPEC row-for-row against the JSON."""
    torch = pytest.importorskip("torch")  # noqa: F841
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers_yolo_torch import HEAD_LAYERS, SPEC

    assert list(HEAD_LAYERS) == GRAPH["head_layers"]
    assert len(SPEC) == len(GRAPH["nodes"])
    for (frm, name, args), node in zip(SPEC, GRAPH["nodes"]):
        assert name == node["op"], node["i"]
        jf = node["from"]
        assert (list(frm) if isinstance(frm, list) else frm) == jf, node["i"]
        if name == "Conv":
            c1, c2, k, s = args
            assert (c1, c2, k, s) == (node["c1"], node["c2"], node["k"],
                                      node["s"]), node["i"]
        elif name == "SP":
            assert args[0] == node["k"], node["i"]


def test_flax_module_matches_graph():
    """The ACTUAL YOLOv7Tiny param tree must carry exactly the spec's
    convs with the spec's kernel shapes (k, k, c1, c2)."""
    import jax
    import jax.numpy as jnp

    from hgr_tpu.models.yolo import YOLOv7Tiny
    from hgr_tpu.utils.onnx_port import DETECT_CONVS

    model = YOLOv7Tiny(num_classes=1)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False))
    params = variables["params"]

    def get(tree, path):
        node = tree
        for p in path.split("/"):
            node = node[p]
        return node

    for node in GRAPH["nodes"]:
        if node["op"] != "Conv":
            continue
        kern = get(params, node["flax"] + "/conv/kernel")
        assert kern.shape == (node["k"], node["k"], node["c1"],
                              node["c2"]), node["flax"]
    no = 3 * (5 + 1)
    for name, c_in in zip(DETECT_CONVS, GRAPH["detect"]["in_channels"]):
        kern = get(params, name + "/kernel")
        assert kern.shape == (1, 1, c_in, no), name
