"""YOLOv7-tiny hand detector — Flax/NHWC re-design.

The reference uses an externally-trained YOLOv7-tiny as an opaque ONNX
session with NMS baked into the graph (reference detect.py:67-77,122-126;
output rows are [batch, x0, y0, x1, y1, cls, score]). Here the detector is
a first-class JAX module so detect->crop->classify compiles into ONE XLA
graph (BASELINE.json north star), with:

  * the standard YOLOv7-tiny topology (leaky-ReLU 0.1 convs, ELAN-tiny
    blocks, MP downsampling, SPP-CSP neck, 3 detection scales with
    anchors P3/8 P4/16 P5/32);
  * sigmoid box decode identical to the yolov7 IDetect inference path:
    xy = (2*sig(txy) - 0.5 + grid) * stride,
    wh = (2*sig(twh))^2 * anchor;
  * score = sigmoid(obj) * sigmoid(cls);
  * ``best_box`` single-hand selection (the reference pipeline consumes
    only the top detection, detect.py:129) and a fixed-size batched NMS
    for multi-detection use.

Weights load from a ``.npz`` of named arrays (see ``load_npz_weights``)
or convert from a reference ONNX file when the ``onnx`` package is
available (hgr_tpu.utils.onnx_port).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

# yolov7-tiny anchors (w, h) per scale — public cfg/training/yolov7-tiny.yaml.
# BatchNorm epsilon of the yolov7-tiny Conv blocks (torch BatchNorm2d
# eps=1e-3 in the upstream cfg); the ONNX weight porter references this
# to build exact identity BNs for fused-conv graphs.
BN_EPS = 1e-3

ANCHORS = (
    ((10.0, 13.0), (16.0, 30.0), (33.0, 23.0)),      # P3, stride 8
    ((30.0, 61.0), (62.0, 45.0), (59.0, 119.0)),     # P4, stride 16
    ((116.0, 90.0), (156.0, 198.0), (373.0, 326.0)),  # P5, stride 32
)
STRIDES = (8, 16, 32)


class ConvAct(nn.Module):
    """conv(bias=False) + BN + LeakyReLU(0.1) — the yolov7-tiny Conv."""

    features: int
    kernel_size: int = 1
    strides: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        p = self.kernel_size // 2
        from hgr_tpu.models.layers import torch_kernel_init

        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    padding=((p, p), (p, p)), use_bias=False,
                    kernel_init=torch_kernel_init(),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    precision=self.precision, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=BN_EPS, dtype=jnp.float32, name="bn")(x)
        return nn.leaky_relu(x, 0.1).astype(self.dtype)


class ElanTiny(nn.Module):
    """yolov7-tiny ELAN block: two 1x1 branches, two chained 3x3 convs,
    concat 4 ways, 1x1 out."""

    hidden: int
    out: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, precision=self.precision)
        a = ConvAct(self.hidden, 1, name="cv1", **kw)(x, train)
        b = ConvAct(self.hidden, 1, name="cv2", **kw)(x, train)
        c = ConvAct(self.hidden, 3, name="cv3", **kw)(b, train)
        d = ConvAct(self.hidden, 3, name="cv4", **kw)(c, train)
        y = jnp.concatenate([d, c, b, a], axis=-1)
        return ConvAct(self.out, 1, name="out", **kw)(y, train)


def _maxpool(x: Array, k: int, s: int) -> Array:
    pad = (k - 1) // 2
    return nn.max_pool(x, (k, k), strides=(s, s),
                       padding=((pad, pad), (pad, pad)))


class SppCspTiny(nn.Module):
    """yolov7-tiny SPP block: 1x1 reduce, maxpool 5/9/13 pyramid, concat,
    1x1, merged with a parallel 1x1 branch."""

    hidden: int
    out: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kw = dict(dtype=self.dtype, precision=self.precision)
        a = ConvAct(self.hidden, 1, name="cv1", **kw)(x, train)
        b = ConvAct(self.hidden, 1, name="cv2", **kw)(x, train)
        p5 = _maxpool(b, 5, 1)
        p9 = _maxpool(b, 9, 1)
        p13 = _maxpool(b, 13, 1)
        y = jnp.concatenate([p13, p9, p5, b], axis=-1)
        y = ConvAct(self.hidden, 1, name="cv3", **kw)(y, train)
        y = jnp.concatenate([y, a], axis=-1)
        return ConvAct(self.out, 1, name="out", **kw)(y, train)


class YOLOv7Tiny(nn.Module):
    """Full yolov7-tiny detector. Input (B, H, W, 3) in [0, 1]; H, W
    multiples of 32 (the reference letterboxes to 416, detect.py:84-86).

    Returns raw per-scale feature maps; use ``decode_predictions`` /
    ``best_box`` on the outputs.
    """

    num_classes: int = 1
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        d = self.dtype
        x = x.astype(d)
        # backbone
        x = ConvAct(32, 3, 2, dtype=d, precision=self.precision, name="stem1")(x, train)   # /2
        x = ConvAct(64, 3, 2, dtype=d, precision=self.precision, name="stem2")(x, train)   # /4
        x = ElanTiny(32, 64, dtype=d, precision=self.precision, name="elan1")(x, train)
        x = _maxpool(x, 2, 2)                                    # /8
        p3 = ElanTiny(64, 128, dtype=d, precision=self.precision, name="elan2")(x, train)
        x = _maxpool(p3, 2, 2)                                   # /16
        p4 = ElanTiny(128, 256, dtype=d, precision=self.precision, name="elan3")(x, train)
        x = _maxpool(p4, 2, 2)                                   # /32
        p5 = ElanTiny(256, 512, dtype=d, precision=self.precision, name="elan4")(x, train)

        # neck
        n5 = SppCspTiny(256, 256, dtype=d, precision=self.precision, name="spp")(p5, train)
        u4 = ConvAct(128, 1, dtype=d, precision=self.precision, name="up4_conv")(n5, train)
        u4 = _upsample2(u4)
        r4 = ConvAct(128, 1, dtype=d, precision=self.precision, name="route4")(p4, train)
        n4 = ElanTiny(64, 128, dtype=d, precision=self.precision, name="neck4")(
            jnp.concatenate([r4, u4], axis=-1), train)
        u3 = ConvAct(64, 1, dtype=d, precision=self.precision, name="up3_conv")(n4, train)
        u3 = _upsample2(u3)
        r3 = ConvAct(64, 1, dtype=d, precision=self.precision, name="route3")(p3, train)
        n3 = ElanTiny(32, 64, dtype=d, precision=self.precision, name="neck3")(
            jnp.concatenate([r3, u3], axis=-1), train)

        d4 = ConvAct(128, 3, 2, dtype=d, precision=self.precision, name="down4")(n3, train)
        n4b = ElanTiny(64, 128, dtype=d, precision=self.precision, name="neck4b")(
            jnp.concatenate([d4, n4], axis=-1), train)
        d5 = ConvAct(256, 3, 2, dtype=d, precision=self.precision, name="down5")(n4b, train)
        n5b = ElanTiny(128, 256, dtype=d, precision=self.precision, name="neck5b")(
            jnp.concatenate([d5, n5], axis=-1), train)

        # heads: 3x3 conv then 1x1 detect conv (bias=True)
        no = 3 * (5 + self.num_classes)
        outs = []
        for i, (feat, ch) in enumerate(
                ((n3, 128), (n4b, 256), (n5b, 512))):
            h = ConvAct(ch, 3, dtype=d, precision=self.precision, name=f"head{i}_conv")(feat, train)
            o = nn.Conv(no, (1, 1), use_bias=True, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        precision=self.precision, name=f"detect{i}")(h)
            outs.append(o)
        return outs


def _upsample2(x: Array) -> Array:
    """2x nearest upsample."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def decode_predictions(
    outs: Sequence[Array],
    num_classes: int = 1,
    anchors=ANCHORS,
    strides=STRIDES,
) -> Array:
    """Raw head outputs -> (B, N, 5 + nc) rows [cx, cy, w, h, obj, cls...]
    in input-image pixels (yolov7 IDetect inference decode)."""
    batch = outs[0].shape[0]
    all_rows = []
    for out, anc, stride in zip(outs, anchors, strides):
        b, h, w, _ = out.shape
        na = len(anc)
        no = 5 + num_classes
        o = out.reshape(b, h, w, na, no)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]
        sig = jax.nn.sigmoid(o)
        xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
        anc_arr = jnp.asarray(anc)[None, None, None, :, :]
        wh = (sig[..., 2:4] * 2.0) ** 2 * anc_arr
        rest = sig[..., 4:]
        rows = jnp.concatenate([xy, wh, rest], axis=-1)
        all_rows.append(rows.reshape(b, h * w * na, no))
    return jnp.concatenate(all_rows, axis=1)


def best_box(decoded: Array) -> Tuple[Array, Array]:
    """Top-1 box per image (the reference consumes only outputs[0],
    detect.py:129). Returns (boxes (B, 4) [x0, y0, x1, y1], scores (B,))."""
    obj = decoded[..., 4]
    cls_best = jnp.max(decoded[..., 5:], axis=-1)
    score = obj * cls_best
    idx = jnp.argmax(score, axis=-1)
    rows = jnp.take_along_axis(decoded, idx[:, None, None], axis=1)[:, 0]
    cx, cy, w, h = rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                      axis=-1)
    return boxes, jnp.take_along_axis(score, idx[:, None], axis=1)[:, 0]


def nms(
    decoded: Array,
    score_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_det: int = 100,
) -> Tuple[Array, Array, Array]:
    """Fixed-size batched NMS (jit-friendly: top-k + O(k^2) suppression).

    Returns (boxes (B, max_det, 4) xyxy, scores (B, max_det),
    classes (B, max_det)); suppressed slots have score 0.
    """
    obj = decoded[..., 4]
    cls_scores = decoded[..., 5:]
    cls_best = jnp.max(cls_scores, axis=-1)
    cls_idx = jnp.argmax(cls_scores, axis=-1)
    score = obj * cls_best
    score = jnp.where(score >= score_thresh, score, 0.0)

    k = min(max_det, score.shape[-1])
    top_scores, top_idx = jax.lax.top_k(score, k)
    rows = jnp.take_along_axis(decoded, top_idx[..., None], axis=1)
    classes = jnp.take_along_axis(cls_idx, top_idx, axis=1)
    cx, cy, w, h = (rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3])
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                      axis=-1)  # (B, k, 4)

    # pairwise IoU (B, k, k)
    area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    lt = jnp.maximum(boxes[:, :, None, :2], boxes[:, None, :, :2])
    rb = jnp.minimum(boxes[:, :, None, 2:], boxes[:, None, :, 2:])
    wh_i = jnp.clip(rb - lt, 0.0)
    inter = wh_i[..., 0] * wh_i[..., 1]
    union = area[:, :, None] + area[:, None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)

    same_class = classes[:, :, None] == classes[:, None, :]
    # greedy: a box is kept if no higher-scoring SAME-CLASS kept box
    # overlaps it; scan in score order.
    def body(i, keep):
        overlap = (iou[:, i, :] > iou_thresh) & same_class[:, i, :]
        higher = jnp.arange(k)[None, :] < i
        suppressed = jnp.any(overlap & higher & keep, axis=-1)
        return keep.at[:, i].set(~suppressed & (top_scores[:, i] > 0))

    keep = jnp.ones((boxes.shape[0], k), bool)
    keep = jax.lax.fori_loop(0, k, body, keep)
    out_scores = jnp.where(keep, top_scores, 0.0)
    return boxes, out_scores, classes


def load_npz_weights(path: str) -> Dict[str, Any]:
    """Load detector variables from an .npz with flax-path keys, e.g.
    'params/stem1/conv/kernel', 'batch_stats/stem1/bn/mean'."""
    raw = np.load(path)
    tree: Dict[str, Any] = {}
    for key in raw.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = raw[key]
    return tree
