"""Training loss for the YOLOv7-tiny detector (single-box-per-image).

The reference consumes its hand detector as an opaque externally-trained
ONNX artifact (reference detect.py:67, README.md:84) and cannot train or
fine-tune it. This module closes that gap with a compact single-target
assignment loss sufficient to train/fine-tune the detector on hand-box
data (and to prove, end-to-end, that the fused detect->crop->classify
graph localizes — tests/test_detector_smoke.py):

  * each ground-truth box is assigned to its best (scale, anchor) by
    wh-IoU against the anchor table, at the grid cell containing the box
    center (classic YOLOv3-style single assignment — yolov7's OTA
    machinery is unnecessary at this scale);
  * box regression inverts the exact IDetect decode the inference path
    uses (models/yolo.py:decode_predictions): targets are expressed in
    the sigmoid domain so the loss and the serving decode cannot drift;
  * objectness is BCE over every cell (positives 1), class is BCE at
    positives.

Everything is static-shaped and jit/grad-friendly (scatter via .at).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from hgr_tpu.models.yolo import ANCHORS, STRIDES

Array = jax.Array


def _bce_logits(logits: Array, targets: Array) -> Array:
    """Elementwise binary cross-entropy on logits (stable form)."""
    return (jnp.maximum(logits, 0.0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def assign_targets(
    gt_cxcywh: Array,  # (B, 4) pixels, one box per image
    grid_hw: Sequence[Tuple[int, int]],
    anchors=ANCHORS,
    strides=STRIDES,
):
    """Best (scale, anchor) per GT by wh-IoU, plus its cell and sigmoid-
    domain regression targets. Returns per-scale tuples
    (scale_mask (B,), anchor_idx (B,), cell_yx (B, 2) int32,
    t_sig (B, 4) [sx, sy, sw, sh])."""
    w, h = gt_cxcywh[:, 2], gt_cxcywh[:, 3]
    flat_anchors = jnp.asarray(
        [a for scale in anchors for a in scale])  # (9, 2)
    inter = (jnp.minimum(w[:, None], flat_anchors[None, :, 0])
             * jnp.minimum(h[:, None], flat_anchors[None, :, 1]))
    union = (w * h)[:, None] + (flat_anchors[:, 0]
                                * flat_anchors[:, 1])[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    best = jnp.argmax(iou, axis=-1)  # (B,) in [0, 9)
    best_scale = best // 3
    best_anchor = best % 3

    out = []
    for s, ((gh, gw), anc, stride) in enumerate(
            zip(grid_hw, anchors, strides)):
        mask = (best_scale == s)
        cx_g = gt_cxcywh[:, 0] / stride
        cy_g = gt_cxcywh[:, 1] / stride
        gx = jnp.clip(jnp.floor(cx_g), 0, gw - 1)
        gy = jnp.clip(jnp.floor(cy_g), 0, gh - 1)
        # invert xy = (2 sig - 0.5 + g) * stride  ->  sig in [0.25, 0.75]
        sx = jnp.clip((cx_g - gx + 0.5) / 2.0, 1e-4, 1 - 1e-4)
        sy = jnp.clip((cy_g - gy + 0.5) / 2.0, 1e-4, 1 - 1e-4)
        # invert wh = (2 sig)^2 * anchor  ->  sig = sqrt(wh/anchor)/2
        anc_arr = jnp.asarray(anc)  # (3, 2)
        aw = anc_arr[best_anchor, 0]
        ah = anc_arr[best_anchor, 1]
        sw = jnp.clip(jnp.sqrt(jnp.maximum(w / aw, 1e-8)) / 2.0,
                      1e-4, 1 - 1e-4)
        sh = jnp.clip(jnp.sqrt(jnp.maximum(h / ah, 1e-8)) / 2.0,
                      1e-4, 1 - 1e-4)
        out.append((mask, best_anchor,
                    jnp.stack([gy, gx], axis=-1).astype(jnp.int32),
                    jnp.stack([sx, sy, sw, sh], axis=-1)))
    return out


def yolo_single_box_loss(
    outs: List[Array],  # raw head outputs (B, Hs, Ws, 3*(5+nc))
    gt_cxcywh: Array,  # (B, 4) pixels (letterboxed input space)
    num_classes: int = 1,
    box_weight: float = 5.0,
    obj_weight: float = 1.0,
    cls_weight: float = 1.0,
) -> Tuple[Array, dict]:
    """Total loss + parts for one GT box per image."""
    b = gt_cxcywh.shape[0]
    no = 5 + num_classes
    grid_hw = [(o.shape[1], o.shape[2]) for o in outs]
    assigned = assign_targets(gt_cxcywh, grid_hw)

    total_obj = 0.0
    total_box = 0.0
    total_cls = 0.0
    n_cells = 0
    bidx = jnp.arange(b)
    for out, (mask, anc_idx, cell_yx, t_sig) in zip(outs, assigned):
        _, gh, gw, _ = out.shape
        o = out.reshape(b, gh, gw, 3, no)
        # positive-cell logits, gathered per image (static shapes)
        pos = o[bidx, cell_yx[:, 0], cell_yx[:, 1], anc_idx]  # (B, no)
        m = mask.astype(jnp.float32)

        # box: BCE in the sigmoid domain == pushing sig(t) toward target
        box_l = jnp.sum(_bce_logits(pos[:, 0:4], t_sig), axis=-1)
        total_box = total_box + jnp.sum(box_l * m)

        # objectness target grid: 1 only at assigned cells of this scale
        t_obj = jnp.zeros((b, gh, gw, 3))
        t_obj = t_obj.at[bidx, cell_yx[:, 0], cell_yx[:, 1],
                         anc_idx].set(m)
        total_obj = total_obj + jnp.sum(
            jnp.mean(_bce_logits(o[..., 4], t_obj), axis=(1, 2, 3)))
        n_cells += 1

        if num_classes > 0:
            cls_l = jnp.sum(_bce_logits(
                pos[:, 5:], jnp.ones((b, num_classes))), axis=-1)
            total_cls = total_cls + jnp.sum(cls_l * m)

    n_pos = jnp.maximum(jnp.float32(b), 1.0)
    parts = {
        "box": box_weight * total_box / n_pos,
        "obj": obj_weight * total_obj / jnp.float32(n_cells),
        "cls": cls_weight * total_cls / n_pos,
    }
    total = parts["box"] + parts["obj"] + parts["cls"]
    return total, parts
