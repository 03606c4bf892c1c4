"""Faithful torch YOLOv7-tiny — the parity oracle for the ONNX port test.

``SPEC`` is a literal transcription of the public
WongKinYiu/yolov7 ``cfg/deploy/yolov7-tiny.yaml`` graph (the network the
reference's opaque yolov7-tiny.onnx was exported from, reference
README.md:84): each row is (from_indices, module, args), executed
sequentially exactly like yolov7's parse_model/forward_once. Running
this spec IS the conv execution order the torch.onnx tracer emits — the
order hgr_tpu.utils.onnx_port.CONV_ORDER must match.

Only used by tests (torch is CPU-only in this image).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import torch
import torch.nn as nn


class Conv(nn.Module):
    """conv(bias=False) + BN(eps 1e-3, momentum .03) + LeakyReLU(0.1)."""

    def __init__(self, c1: int, c2: int, k: int = 1, s: int = 1):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.LeakyReLU(0.1)

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class MP(nn.Module):
    def forward(self, x):
        return nn.functional.max_pool2d(x, 2, 2)


class SP(nn.Module):
    def __init__(self, k: int):
        super().__init__()
        self.k = k

    def forward(self, x):
        return nn.functional.max_pool2d(x, self.k, 1, self.k // 2)


class Concat(nn.Module):
    def forward(self, xs):
        return torch.cat(xs, dim=1)


class Up(nn.Module):
    def forward(self, x):
        return nn.functional.interpolate(x, scale_factor=2, mode="nearest")


# (from, module_name, args) — yolov7-tiny.yaml backbone+head, verbatim
# structure. from == -1 means previous output; lists feed Concat.
SPEC: List[Tuple] = [
    (-1, "Conv", (3, 32, 3, 2)),      # 0  P1/2
    (-1, "Conv", (32, 64, 3, 2)),     # 1  P2/4
    (-1, "Conv", (64, 32, 1, 1)),     # 2
    (-2, "Conv", (64, 32, 1, 1)),     # 3
    (-1, "Conv", (32, 32, 3, 1)),     # 4
    (-1, "Conv", (32, 32, 3, 1)),     # 5
    ([-1, -2, -3, -4], "Concat", ()),  # 6
    (-1, "Conv", (128, 64, 1, 1)),    # 7
    (-1, "MP", ()),                   # 8  P3/8
    (-1, "Conv", (64, 64, 1, 1)),     # 9
    (-2, "Conv", (64, 64, 1, 1)),     # 10
    (-1, "Conv", (64, 64, 3, 1)),     # 11
    (-1, "Conv", (64, 64, 3, 1)),     # 12
    ([-1, -2, -3, -4], "Concat", ()),  # 13
    (-1, "Conv", (256, 128, 1, 1)),   # 14
    (-1, "MP", ()),                   # 15 P4/16
    (-1, "Conv", (128, 128, 1, 1)),   # 16
    (-2, "Conv", (128, 128, 1, 1)),   # 17
    (-1, "Conv", (128, 128, 3, 1)),   # 18
    (-1, "Conv", (128, 128, 3, 1)),   # 19
    ([-1, -2, -3, -4], "Concat", ()),  # 20
    (-1, "Conv", (512, 256, 1, 1)),   # 21
    (-1, "MP", ()),                   # 22 P5/32
    (-1, "Conv", (256, 256, 1, 1)),   # 23
    (-2, "Conv", (256, 256, 1, 1)),   # 24
    (-1, "Conv", (256, 256, 3, 1)),   # 25
    (-1, "Conv", (256, 256, 3, 1)),   # 26
    ([-1, -2, -3, -4], "Concat", ()),  # 27
    (-1, "Conv", (1024, 512, 1, 1)),  # 28
    # SPPCSPC-tiny
    (-1, "Conv", (512, 256, 1, 1)),   # 29
    (-2, "Conv", (512, 256, 1, 1)),   # 30
    (-1, "SP", (5,)),                 # 31
    (-2, "SP", (9,)),                 # 32
    (-3, "SP", (13,)),                # 33
    ([-1, -2, -3, -4], "Concat", ()),  # 34
    (-1, "Conv", (1024, 256, 1, 1)),  # 35
    ([-1, -7], "Concat", ()),         # 36
    (-1, "Conv", (512, 256, 1, 1)),   # 37
    # top-down
    (-1, "Conv", (256, 128, 1, 1)),   # 38
    (-1, "Up", ()),                   # 39
    (21, "Conv", (256, 128, 1, 1)),   # 40 route P4
    ([-1, -2], "Concat", ()),         # 41
    (-1, "Conv", (256, 64, 1, 1)),    # 42
    (-2, "Conv", (256, 64, 1, 1)),    # 43
    (-1, "Conv", (64, 64, 3, 1)),     # 44
    (-1, "Conv", (64, 64, 3, 1)),     # 45
    ([-1, -2, -3, -4], "Concat", ()),  # 46
    (-1, "Conv", (256, 128, 1, 1)),   # 47
    (-1, "Conv", (128, 64, 1, 1)),    # 48
    (-1, "Up", ()),                   # 49
    (14, "Conv", (128, 64, 1, 1)),    # 50 route P3
    ([-1, -2], "Concat", ()),         # 51
    (-1, "Conv", (128, 32, 1, 1)),    # 52
    (-2, "Conv", (128, 32, 1, 1)),    # 53
    (-1, "Conv", (32, 32, 3, 1)),     # 54
    (-1, "Conv", (32, 32, 3, 1)),     # 55
    ([-1, -2, -3, -4], "Concat", ()),  # 56
    (-1, "Conv", (128, 64, 1, 1)),    # 57  -> P3 head in
    # bottom-up
    (-1, "Conv", (64, 128, 3, 2)),    # 58
    ([-1, 47], "Concat", ()),         # 59
    (-1, "Conv", (256, 64, 1, 1)),    # 60
    (-2, "Conv", (256, 64, 1, 1)),    # 61
    (-1, "Conv", (64, 64, 3, 1)),     # 62
    (-1, "Conv", (64, 64, 3, 1)),     # 63
    ([-1, -2, -3, -4], "Concat", ()),  # 64
    (-1, "Conv", (256, 128, 1, 1)),   # 65  -> P4 head in
    (-1, "Conv", (128, 256, 3, 2)),   # 66
    ([-1, 37], "Concat", ()),         # 67
    (-1, "Conv", (512, 128, 1, 1)),   # 68
    (-2, "Conv", (512, 128, 1, 1)),   # 69
    (-1, "Conv", (128, 128, 3, 1)),   # 70
    (-1, "Conv", (128, 128, 3, 1)),   # 71
    ([-1, -2, -3, -4], "Concat", ()),  # 72
    (-1, "Conv", (512, 256, 1, 1)),   # 73  -> P5 head in
    (57, "Conv", (64, 128, 3, 1)),    # 74 head conv P3
    (65, "Conv", (128, 256, 3, 1)),   # 75 head conv P4
    (73, "Conv", (256, 512, 3, 1)),   # 76 head conv P5
]
HEAD_LAYERS = (74, 75, 76)

_MODULES = {"Conv": Conv, "MP": MP, "SP": SP, "Concat": Concat, "Up": Up}


class TorchYoloV7Tiny(nn.Module):
    """Spec runner + fused IDetect 1x1 convs (ia/im implicits are fused
    into the conv at export time in yolov7, so the deploy graph is a
    plain biased conv per scale)."""

    def __init__(self, num_classes: int = 1, seed: int = 0):
        super().__init__()
        torch.manual_seed(seed)
        self.layers = nn.ModuleList(
            [_MODULES[name](*args) for _, name, args in SPEC])
        no = 3 * (5 + num_classes)
        self.detect = nn.ModuleList(
            [nn.Conv2d(c, no, 1, bias=True) for c in (128, 256, 512)])
        self.num_classes = num_classes
        # randomize BN stats so fusion is actually exercised
        g = torch.Generator().manual_seed(seed + 1)
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.num_features, generator=g) * 0.3)
                m.running_var.copy_(
                    torch.rand(m.num_features, generator=g) * 2 + 0.2)

    def forward(self, x):
        outputs = []
        cur = x
        for i, (frm, _name, _args) in enumerate(SPEC):
            if isinstance(frm, list):
                xs = [outputs[j if j >= 0 else i + j] for j in frm]
                cur = self.layers[i](xs)
            else:
                src = cur if frm == -1 else outputs[i + frm if frm < 0
                                                    else frm]
                cur = self.layers[i](src)
            outputs.append(cur)
        return [self.detect[k](outputs[li])
                for k, li in enumerate(HEAD_LAYERS)]


def fused_convs(model: TorchYoloV7Tiny) -> List[Tuple[np.ndarray,
                                                      np.ndarray]]:
    """(weight OIHW, bias) per conv, BN folded — what yolov7's export
    (attempt_load -> .fuse()) bakes into the ONNX Conv nodes — in
    execution order, detect convs last (IDetect runs after the spec)."""
    out = []
    with torch.no_grad():
        for layer in model.layers:
            if isinstance(layer, Conv):
                w = layer.conv.weight
                bn = layer.bn
                std = torch.sqrt(bn.running_var + bn.eps)
                scale = bn.weight / std
                wf = w * scale[:, None, None, None]
                bf = bn.bias - bn.running_mean * scale
                out.append((wf.numpy().copy(), bf.numpy().copy()))
        for conv in model.detect:
            out.append((conv.weight.numpy().copy(),
                        conv.bias.numpy().copy()))
    return out


class FusedTorchYoloV7Tiny(nn.Module):
    """The DEPLOY network exactly as yolov7's export.py serializes it:
    ``attempt_load(...).fuse()`` folds every BN into its conv before
    ``torch.onnx.export``, so the traced graph is Conv(bias)+LeakyReLU
    pairs. Built from an oracle's fused weights; numerically identical
    to the oracle's eval forward."""

    def __init__(self, oracle: "TorchYoloV7Tiny"):
        super().__init__()
        fused = fused_convs(oracle)
        it = iter(fused)
        mods: List[nn.Module] = []
        for _frm, name, args in SPEC:
            if name == "Conv":
                c1, c2, k, s = args
                conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=True)
                w, b = next(it)
                with torch.no_grad():
                    conv.weight.copy_(torch.from_numpy(w))
                    conv.bias.copy_(torch.from_numpy(b))
                mods.append(nn.Sequential(conv, nn.LeakyReLU(0.1)))
            else:
                mods.append(_MODULES[name](*args))
        self.layers = nn.ModuleList(mods)
        no = oracle.detect[0].out_channels
        self.detect = nn.ModuleList(
            [nn.Conv2d(c, no, 1, bias=True) for c in (128, 256, 512)])
        for dst in self.detect:
            w, b = next(it)
            with torch.no_grad():
                dst.weight.copy_(torch.from_numpy(w))
                dst.bias.copy_(torch.from_numpy(b))

    def forward(self, x):
        outputs = []
        cur = x
        for i, (frm, _name, _args) in enumerate(SPEC):
            if isinstance(frm, list):
                xs = [outputs[j if j >= 0 else i + j] for j in frm]
                cur = self.layers[i](xs)
            else:
                src = cur if frm == -1 else outputs[i + frm if frm < 0
                                                    else frm]
                cur = self.layers[i](src)
            outputs.append(cur)
        return [self.detect[k](outputs[li])
                for k, li in enumerate(HEAD_LAYERS)]


def torch_decode(outs, num_classes: int = 1):
    """yolov7 IDetect inference decode (torch reference for the parity
    test): returns (B, N, 5+nc) rows [cx, cy, w, h, obj, cls...]."""
    anchors = [[(10, 13), (16, 30), (33, 23)],
               [(30, 61), (62, 45), (59, 119)],
               [(116, 90), (156, 198), (373, 326)]]
    strides = [8, 16, 32]
    rows = []
    no = 5 + num_classes
    for out, anc, stride in zip(outs, anchors, strides):
        b, _, h, w = out.shape
        o = out.view(b, 3, no, h, w).permute(0, 3, 4, 1, 2)  # B,H,W,a,no
        sig = torch.sigmoid(o)
        gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w),
                                indexing="ij")
        grid = torch.stack([gx, gy], dim=-1).float()[None, :, :, None, :]
        xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
        anc_t = torch.tensor(anc).float()[None, None, None, :, :]
        wh = (sig[..., 2:4] * 2.0) ** 2 * anc_t
        rows.append(torch.cat([xy, wh, sig[..., 4:]], dim=-1)
                    .reshape(b, h * w * 3, no))
    return torch.cat(rows, dim=1)
