"""Debug visualization: image grids with joints/labels, heatmap overlays,
cls-token attention overlays.

Capability parity with reference libs/vis.py:12-205 (save_batch_image_
with_joints, save_batch_heatmaps, save_batch_attention_map,
save_debug_images). Runs OFF the hot path on host numpy; inputs are the
NHWC device outputs of the eval step.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

from hgr_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from hgr_tpu.ops.heatmap import get_max_preds
from hgr_tpu.utils.draw import draw_joints


def _to_uint8_grid(images: np.ndarray, nrow: int = 8,
                   padding: int = 2) -> np.ndarray:
    """Tile (B, H, W, 3) [0,1]-normalized images into a grid
    (torchvision.make_grid equivalent, reference libs/vis.py:22)."""
    b, h, w, c = images.shape
    xmaps = min(nrow, b)
    ymaps = int(math.ceil(b / xmaps))
    grid = np.zeros(
        (ymaps * (h + padding) + padding, xmaps * (w + padding) + padding, c),
        np.uint8)
    k = 0
    for y in range(ymaps):
        for x in range(xmaps):
            if k >= b:
                break
            img = np.clip(images[k] * 255.0, 0, 255).astype(np.uint8)
            y0 = y * (h + padding) + padding
            x0 = x * (w + padding) + padding
            grid[y0:y0 + h, x0:x0 + w] = img
            k += 1
    return grid


def _unnormalize(images: np.ndarray) -> np.ndarray:
    """ImageNet-normalized -> [0, 1] range."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    x = images * std + mean
    mn, mx = float(x.min()), float(x.max())
    return (x - mn) / (mx - mn + 1e-5)


def _imwrite(path: str, img: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, img)
    except ImportError:
        from PIL import Image

        Image.fromarray(img[..., ::-1]).save(path)


def save_batch_image_with_joints(
    images: np.ndarray,  # (B, H, W, 3) normalized
    labels: np.ndarray,  # (B,)
    joints: np.ndarray,  # (B, J, 2)
    joints_vis: np.ndarray,  # (B, J)
    file_name: str,
    nrow: int = 8,
    padding: int = 2,
) -> None:
    """Grid with joints + class labels (reference libs/vis.py:12-50)."""
    grid = _to_uint8_grid(_unnormalize(images), nrow, padding).copy()
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    xmaps = min(nrow, b)
    for k in range(b):
        y, x = divmod(k, xmaps)
        cx = x * (w + padding) + padding
        cy = y * (h + padding) + padding
        pts = joints[k] + np.array([cx, cy])
        vis_pts = pts[joints_vis[k] > 0].astype(int)
        draw_joints(grid, vis_pts)
        _put_text(grid, str(int(labels[k])), (cx, cy + 25))
    _imwrite(file_name, grid)


def save_batch_heatmaps(
    images: np.ndarray,  # (B, H, W, 3) normalized
    heatmaps: np.ndarray,  # (B, J, Hh, Hw)
    file_name: str,
) -> None:
    """Per-joint heatmap overlay strip (reference libs/vis.py:53-113)."""
    import jax.numpy as jnp

    b, j = heatmaps.shape[:2]
    hh, hw = heatmaps.shape[2], heatmaps.shape[3]
    imgs = _unnormalize(images)
    preds, _ = get_max_preds(jnp.asarray(heatmaps))
    preds = np.asarray(preds)

    grid = np.zeros((b * hh, (j + 1) * hw, 3), np.uint8)
    for i in range(b):
        small = _resize_u8(
            np.clip(imgs[i] * 255, 0, 255).astype(np.uint8), (hh, hw))
        row0 = i * hh
        grid[row0:row0 + hh, 0:hw] = small
        for jj in range(j):
            hm = np.clip(heatmaps[i, jj] * 255, 0, 255).astype(np.uint8)
            colored = _colormap_jet(hm)
            overlay = (colored * 0.7 + small * 0.3).astype(np.uint8)
            px, py = int(preds[i, jj, 0]), int(preds[i, jj, 1])
            overlay[max(0, py - 1):py + 2, max(0, px - 1):px + 2] = (0, 0, 255)
            c0 = (jj + 1) * hw
            grid[row0:row0 + hh, c0:c0 + hw] = overlay
    _imwrite(file_name, grid)


def save_batch_attention_map(
    images: np.ndarray,  # (B, H, W, 3) normalized
    attnmap: np.ndarray,  # (B, heads, N, N)
    file_name: str,
) -> None:
    """cls-token attention overlay (reference libs/vis.py:116-184):
    head-mean of the last layer, token 0 -> patch tokens, reshaped to the
    feature grid, x4 upsampled, normalized, alpha-blended."""
    import jax.numpy as jnp

    from hgr_tpu.ops.resize import upsample_bilinear_align_corners

    b = images.shape[0]
    feat = int(round(math.sqrt(attnmap.shape[-1] - 1)))
    cls_attn = attnmap.mean(axis=1)[:, 0, 1:]  # (B, hw)
    cls_attn = cls_attn.reshape(b, feat, feat)

    up = np.asarray(upsample_bilinear_align_corners(
        jnp.asarray(cls_attn)[..., None], 4))[..., 0]  # (B, 4f, 4f)

    imgs = _unnormalize(images)
    rows = []
    for i in range(b):
        base = _resize_u8(np.clip(imgs[i] * 255, 0, 255).astype(np.uint8),
                          up.shape[1:])
        a = up[i]
        a = (a - a.min()) / (a.max() - a.min() + 1e-8)
        heat = _colormap_jet((a * 255).astype(np.uint8))
        rows.append((base * 0.5 + heat * 0.5).astype(np.uint8))
    strip = np.concatenate(rows, axis=1)
    _imwrite(file_name, strip)


def save_debug_images(
    outputs: Dict[str, np.ndarray],
    prefix: str,
    with_attention: bool = False,
) -> None:
    """Orchestrator (reference libs/vis.py:187-205): GT grid, pred grid,
    GT/pred heatmap strips, attention overlay for val."""
    images = np.asarray(outputs["image"])
    save_batch_image_with_joints(
        images, np.asarray(outputs["label"]), np.asarray(outputs["joints"]),
        np.asarray(outputs["target_weight"]), f"{prefix}_gt.jpg")
    import jax.numpy as jnp

    pred_joints, _ = get_max_preds(jnp.asarray(outputs["heatmap"]))
    save_batch_image_with_joints(
        images, np.asarray(outputs["pred_label"]),
        np.asarray(pred_joints) * 4.0,
        np.asarray(outputs["target_weight"]), f"{prefix}_pred.jpg")
    save_batch_heatmaps(images, np.asarray(outputs["target"]),
                        f"{prefix}_hm_gt.jpg")
    save_batch_heatmaps(images, np.asarray(outputs["heatmap"]),
                        f"{prefix}_hm_pred.jpg")
    if with_attention and outputs.get("attnmap") is not None:
        save_batch_attention_map(
            images, np.asarray(outputs["attnmap"]), f"{prefix}_attn.jpg")


def _resize_u8(img: np.ndarray, out_hw) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (out_hw[1], out_hw[0]))
    except ImportError:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize(
            (out_hw[1], out_hw[0])))


def _colormap_jet(gray: np.ndarray) -> np.ndarray:
    """uint8 grayscale -> BGR jet colormap."""
    try:
        import cv2

        return cv2.applyColorMap(gray, cv2.COLORMAP_JET)
    except ImportError:
        g = gray.astype(np.float32) / 255.0
        r = np.clip(1.5 - np.abs(4 * g - 3), 0, 1)
        gg = np.clip(1.5 - np.abs(4 * g - 2), 0, 1)
        bb = np.clip(1.5 - np.abs(4 * g - 1), 0, 1)
        return (np.stack([bb, gg, r], -1) * 255).astype(np.uint8)


def _put_text(img: np.ndarray, text: str, org) -> None:
    try:
        import cv2

        cv2.putText(img, text, org, cv2.FONT_HERSHEY_SIMPLEX, 1,
                    (255, 0, 0), 2)
    except ImportError:
        pass
