"""ONNX export of the classifier via a functional torch mirror.

The reference ships its model to deployment as a static-shape 2-output
.onnx file (reference export.py:72-78: ``to_onnx`` with a 1x3x192x192
input, attnmap dropped per export.py:43-45) that detect.py then runs
through onnxruntime (detect.py:73-77,143-145). hgr_tpu's native
deployable artifact is StableHLO (infer/export.py), but users migrating
FROM the reference may have onnxruntime consumers (the MeCO robot
stack) that expect the .onnx format. This module produces it:

  * ``TorchMirror`` — a functional NCHW torch re-statement of
    MultiTaskNet driven directly by the Flax variable tree (conv /
    linear kernels transposed to torch layout, BN statistics applied
    with torch semantics). It is NOT a torch module hierarchy mirroring
    the reference's code; forward is plain ``torch.nn.functional`` calls
    walking the converted tree, so parity rests on the same architecture
    facts the Flax model encodes (gelan.py / vit.py citations inline).
  * ``export_onnx`` — torch.onnx.export of the mirror (the SAME
    toolchain that produced the reference's artifact), emitting the
    reference's 2-output signature: label_pred (B, num_classes),
    heatmap_pred (B, J, H/4, W/4).

Parity story: tests/test_onnx_export.py pins mirror-vs-Flax numerics
(~1e-4 f32) and parses the emitted file with the first-party wire
reader (utils/onnx_reader.py) to check the graph inventory. No
onnxruntime exists in this sandbox, so execution-level validation of
the artifact is delegated to torch's exporter — the same trust the
reference places in it (export.py:72-78 runs onnx.checker only).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence, Tuple

import numpy as np

from hgr_tpu.ops.posemb import pos_emb_sincos_2d


def _to_torch_tree(tree: Mapping[str, Any]):
    """Convert a Flax param/stat subtree to torch tensors in torch
    layouts: conv kernels (kh, kw, I, O) -> (O, I, kh, kw); dense
    kernels (I, O) -> (O, I); everything else verbatim."""
    import torch

    out: Dict[str, Any] = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out[k] = _to_torch_tree(v)
            continue
        a = np.asarray(v, np.float32)
        if k == "kernel" and a.ndim == 4:
            a = a.transpose(3, 2, 0, 1)
        elif k == "kernel" and a.ndim == 2:
            a = a.transpose(1, 0)
        # copy: source leaves may be non-writable views (orbax/jax
        # buffers), which torch.from_numpy rejects with a warning
        out[k] = torch.from_numpy(np.array(a, np.float32))
    return out


class TorchMirror:
    """Functional NCHW torch forward of MultiTaskNet from Flax variables.

    Callable: (B, 3, H, W) float32 -> (label_pred, heatmap_pred) with
    the reference's export signature (export.py:43-45 drops attnmap).
    """

    def __init__(
        self,
        variables: Dict[str, Any],
        num_joints: int = 21,
        num_classes: int = 19,
        image_size: Tuple[int, int] = (192, 192),
        backbone: str = "small",
        depth: int = 4,
        heads: int = 8,
        head_dim: int = 32,
        dim: int = 256,
    ):
        import torch

        self.p = _to_torch_tree(variables["params"])
        self.s = _to_torch_tree(variables["batch_stats"])
        # output dims come from the weight shapes; reject a
        # config/checkpoint mismatch instead of silently exporting the
        # weights' dims under the caller's labels
        got_classes = self.p["decoder"]["mlp_head_fc"]["kernel"].shape[0]
        got_joints = self.p["decoder"]["simple_decoder_conv"][
            "kernel"].shape[0]
        if (got_classes, got_joints) != (num_classes, num_joints):
            raise ValueError(
                f"checkpoint has {got_classes} classes / {got_joints} "
                f"joints but the config says {num_classes} / {num_joints}")
        self.num_joints = num_joints
        self.num_classes = num_classes
        self.backbone = backbone
        self.depth = depth
        self.heads = heads
        self.head_dim = head_dim
        self.dim = dim
        h, w = image_size[0] // 16, image_size[1] // 16
        self.feat_hw = (h, w)
        self.pe = torch.from_numpy(
            np.asarray(pos_emb_sincos_2d(h, w, dim), np.float32))

    # -- building blocks ------------------------------------------------

    def _cba(self, x, p, s, stride=1, act=True):
        """Conv+BN(+SiLU) (reference model/gelan.py:18-56; flax
        layers.ConvBnAct)."""
        import torch.nn.functional as F

        k = p["conv"]["kernel"]
        x = F.conv2d(x, k, stride=stride, padding=k.shape[-1] // 2)
        x = F.batch_norm(x, s["bn"]["mean"], s["bn"]["var"],
                         p["bn"]["scale"], p["bn"]["bias"], eps=1e-5)
        return F.silu(x) if act else x

    def _resblock(self, x, p, s):
        """ResBasicBlock (gelan.py:59-87; flax layers.ResBasicBlock)."""
        import torch.nn.functional as F

        y = self._cba(x, p["cv1"], s["cv1"])
        y = self._cba(y, p["cv2"], s["cv2"], act=False)
        r = x
        if "downsample" in p:
            r = self._cba(x, p["downsample"], s["downsample"], act=False)
        return F.silu(r + y)

    def _gelan_block(self, x, p, s, nblocks):
        """GELANBlock: 1x1 -> chunk2 -> two chains -> concat4 -> 1x1
        (gelan.py:124-142; flax gelan.GELANBlock)."""
        import torch

        y0 = self._cba(x, p["cv1"], s["cv1"])
        half = y0.shape[1] // 2
        a, b = y0[:, :half], y0[:, half:]
        c = b
        for i in range(nblocks):
            c = self._resblock(c, p[f"cv2_{i}"], s[f"cv2_{i}"])
        d = c
        for i in range(nblocks):
            d = self._resblock(d, p[f"cv3_{i}"], s[f"cv3_{i}"])
        y = torch.cat([a, b, c, d], dim=1)
        return self._cba(y, p["cv4"], s["cv4"])

    def _encoder(self, x):
        """GELANNet small/large (gelan.py:145-176; flax gelan.GELANNet)."""
        nb = {"small": 1, "large": 2}[self.backbone]
        p, s = self.p["encoder"], self.s["encoder"]
        x = self._cba(x, p["conv1"], s["conv1"], stride=2)
        x = self._cba(x, p["conv2"], s["conv2"], stride=2)
        x = self._gelan_block(x, p["cspelan1"], s["cspelan1"], nb)
        x = self._cba(x, p["down1"], s["down1"], stride=2)
        x = self._gelan_block(x, p["cspelan2"], s["cspelan2"], nb)
        x = self._cba(x, p["down2"], s["down2"], stride=2)
        return self._gelan_block(x, p["cspelan3"], s["cspelan3"], nb)

    @staticmethod
    def _ln(x, p):
        import torch.nn.functional as F

        return F.layer_norm(x, x.shape[-1:], p["scale"], p["bias"],
                            eps=1e-5)

    def _attention(self, x, p):
        """Pre-LN MHA, qkv/out without bias (transformer.py:45-77; flax
        vit.Attention unfused chain)."""
        import torch
        import torch.nn.functional as F

        b, n, _ = x.shape
        h, hd = self.heads, self.head_dim
        y = self._ln(x, p["norm"])
        qkv = F.linear(y, p["to_qkv"]["kernel"])
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.reshape(b, n, h, hd).transpose(1, 2)
        k = k.reshape(b, n, h, hd).transpose(1, 2)
        v = v.reshape(b, n, h, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-2, -1) * hd ** -0.5, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, h * hd)
        return F.linear(out, p["to_out"]["kernel"])

    def _feedforward(self, x, p):
        """Pre-LN MLP with exact-erf GELU (transformer.py:29-41)."""
        import torch.nn.functional as F

        y = self._ln(x, p["norm"])
        y = F.linear(y, p["fc1"]["kernel"], p["fc1"]["bias"])
        y = F.gelu(y)  # default erf form, matching nn.gelu approximate=False
        return F.linear(y, p["fc2"]["kernel"], p["fc2"]["bias"])

    # -- full forward ---------------------------------------------------

    def __call__(self, x):
        import torch
        import torch.nn.functional as F

        feats = self._encoder(x)
        feats = F.conv2d(feats, self.p["proj"]["kernel"])  # 1x1, no bias

        b = feats.shape[0]
        h, w = self.feat_hw
        dp, dd = self.p["decoder"], self.dim
        # NCHW -> (B, N, C) tokens + sincos pe, cls prepended
        # (transformer.py:129-139; flax vit.ViT).
        tokens = feats.flatten(2).transpose(1, 2) + self.pe
        cls = dp["cls_token"].reshape(1, 1, dd).expand(b, 1, dd)
        tokens = torch.cat([cls, tokens], dim=1)

        for i in range(self.depth):
            tokens = tokens + self._attention(
                tokens, dp["transformer"][f"layers_{i}_attn"])
            tokens = tokens + self._feedforward(
                tokens, dp["transformer"][f"layers_{i}_ff"])

        cls_feat, hmap_feat = tokens[:, 0], tokens[:, 1:]
        logits = self._ln(cls_feat, dp["mlp_head_norm"])
        logits = F.linear(logits, dp["mlp_head_fc"]["kernel"],
                          dp["mlp_head_fc"]["bias"])

        hmap = hmap_feat.transpose(1, 2).reshape(b, dd, h, w)
        hmap = F.interpolate(hmap, scale_factor=4, mode="bilinear",
                             align_corners=True)  # transformer.py:148-149
        hmap = F.relu(hmap)
        hmap = F.conv2d(hmap, dp["simple_decoder_conv"]["kernel"],
                        dp["simple_decoder_conv"]["bias"])
        return logits, hmap


class _ExportModule:
    """Lazy torch.nn.Module wrapper (defined at call time so importing
    this module never requires torch)."""

    def __new__(cls, mirror: TorchMirror):
        import torch

        class M(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.mirror = mirror

            def forward(self, x):
                return self.mirror(x)

        return M()


def _ensure_onnx_stub():
    """torch.onnx.export scans for custom onnxscript functions through the
    ``onnx`` package, which this environment does not ship. The scan is
    inapplicable here (no custom-domain ops) and returns the serialized
    bytes unchanged, so when ``onnx`` is missing we install a minimal
    stub that short-circuits it — the .onnx file itself is produced
    entirely by torch's C++ serializer. Returns an undo callable."""
    import sys
    import types

    if "onnx" in sys.modules:
        return lambda: None
    try:
        import onnx  # noqa: F401

        return lambda: None
    except ImportError:
        pass
    stub = types.ModuleType("onnx")

    class _Graph:
        node = ()

    class _Model:
        graph = _Graph()
        functions = []

    stub.load_model_from_string = lambda b: _Model()
    sys.modules["onnx"] = stub
    return lambda: sys.modules.pop("onnx", None)


def export_onnx(
    variables: Dict[str, Any],
    path: str,
    *,
    num_joints: int = 21,
    num_classes: int = 19,
    image_size: Sequence[int] = (192, 192),
    backbone: str = "small",
    batch: int = 1,
    opset: int = 13,
) -> TorchMirror:
    """Write the reference-signature .onnx artifact (export.py:72-78:
    static (batch, 3, H, W) input, outputs label_pred + heatmap_pred).
    Returns the traced mirror so callers can eval through it without a
    second weight-tree conversion."""
    import torch

    mirror = TorchMirror(
        variables, num_joints=num_joints, num_classes=num_classes,
        image_size=tuple(image_size), backbone=backbone)
    module = _ExportModule(mirror).eval()
    dummy = torch.zeros(batch, 3, image_size[0], image_size[1])
    undo_stub = _ensure_onnx_stub()
    try:
        with torch.no_grad():
            torch.onnx.export(
                module, (dummy,), path,
                input_names=["input"],
                output_names=["label_pred", "heatmap_pred"],
                opset_version=opset,
                do_constant_folding=True,
                dynamo=False,
            )
    finally:
        undo_stub()
    return mirror
