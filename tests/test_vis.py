"""Unit tests for utils/vis.py (VERDICT r1 #9): grid layout math,
heatmap strip dimensions, attention reshape/upsample — against
hand-computed goldens (reference libs/vis.py:12-205 behaviors).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from hgr_tpu.config import IMAGENET_MEAN, IMAGENET_STD
from hgr_tpu.utils.vis import (
    _to_uint8_grid,
    _unnormalize,
    save_batch_attention_map,
    save_batch_heatmaps,
    save_batch_image_with_joints,
    save_debug_images,
)


def _normed(images01: np.ndarray) -> np.ndarray:
    """[0,1] float images -> ImageNet-normalized (what the eval step
    emits)."""
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    return (images01 - mean) / std


def test_grid_layout_coordinates():
    """B=5, nrow=8 -> 1 row of 5; tile k sits at
    (pad, k*(w+pad)+pad); padding stays black."""
    b, h, w, pad = 5, 6, 10, 2
    images = np.zeros((b, h, w, 3), np.float32)
    for k in range(b):
        images[k] = (k + 1) / 5.0  # distinct constant per tile
    grid = _to_uint8_grid(images, nrow=8, padding=pad)
    assert grid.shape == (1 * (h + pad) + pad, 5 * (w + pad) + pad, 3)
    for k in range(b):
        y0, x0 = pad, k * (w + pad) + pad
        expected = int(round((k + 1) / 5.0 * 255))
        block = grid[y0:y0 + h, x0:x0 + w]
        assert np.all(np.abs(block.astype(int) - expected) <= 1), k
    assert (grid[:pad] == 0).all()  # top padding row
    assert (grid[:, :pad] == 0).all()  # left padding col


def test_grid_wraps_rows():
    b, h, w, pad = 10, 4, 4, 2
    grid = _to_uint8_grid(np.ones((b, h, w, 3), np.float32), nrow=8,
                          padding=pad)
    ymaps = math.ceil(10 / 8)
    assert grid.shape == (ymaps * (h + pad) + pad, 8 * (w + pad) + pad, 3)
    # 11th..16th cells of row 2 are empty (only 2 images wrap)
    y0 = (h + pad) + pad
    x_filled = 2 * (w + pad) + pad
    assert grid[y0:y0 + h, pad:pad + w].max() == 255
    assert grid[y0:y0 + h, x_filled:].max() == 0


def test_unnormalize_range():
    rng = np.random.RandomState(0)
    imgs01 = rng.rand(2, 8, 8, 3).astype(np.float32)
    out = _unnormalize(_normed(imgs01))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # min-max rescale preserves ordering along each channel
    flat_in, flat_out = imgs01.ravel(), out.ravel()
    i, j = np.argmin(flat_in), np.argmax(flat_in)
    assert flat_out[i] == out.min() and flat_out[j] == out.max()


def test_joints_grid_file_and_dims(tmp_path):
    b, h, w = 3, 32, 32
    rng = np.random.RandomState(1)
    images = _normed(rng.rand(b, h, w, 3).astype(np.float32))
    joints = rng.rand(b, 21, 2).astype(np.float32) * 20 + 5
    vis = np.ones((b, 21), np.float32)
    path = str(tmp_path / "joints.jpg")
    save_batch_image_with_joints(images, np.arange(b), joints, vis, path,
                                 nrow=8, padding=2)
    assert os.path.isfile(path)
    from PIL import Image

    im = np.asarray(Image.open(path))
    assert im.shape == (1 * (h + 2) + 2, b * (w + 2) + 2, 3)


def test_heatmap_strip_dims_and_peak_marker(tmp_path):
    """Strip is (B*Hh) x ((J+1)*Hw); the predicted-peak marker (pure red
    in BGR byte order) lands at the heatmap argmax cell."""
    b, j, hh, hw = 2, 4, 16, 16
    h, w = 64, 64
    rng = np.random.RandomState(2)
    images = _normed(rng.rand(b, h, w, 3).astype(np.float32))
    heatmaps = np.zeros((b, j, hh, hw), np.float32)
    peaks = [(3, 5), (9, 12), (7, 2), (14, 8)]
    for jj, (py, px) in enumerate(peaks):
        heatmaps[:, jj, py, px] = 1.0
    path = str(tmp_path / "hm.jpg")
    save_batch_heatmaps(images, heatmaps, path)
    from PIL import Image

    im = np.asarray(Image.open(path))  # PIL reads back RGB of a BGR write
    assert im.shape == (b * hh, (j + 1) * hw, 3)
    for jj, (py, px) in enumerate(peaks):
        cell = im[py, (jj + 1) * hw + px]
        # marker written as BGR (0,0,255) -> decoded RGB blue-ish channel
        # dominant in the LAST position of the written triple; just
        # require the marker to be saturated in exactly one channel.
        assert cell.max() > 200, (jj, cell)


def test_attention_reshape_and_upsample(tmp_path):
    """A cls-token attention spike on patch (r, c) of the 12x12 grid must
    surface at ~(4r..4r+4, 4c..4c+4) of the x4-upsampled overlay."""
    b, heads, feat = 1, 8, 12
    n = feat * feat + 1
    h = w = feat * 16
    images = _normed(np.full((b, h, w, 3), 0.5, np.float32))
    attn = np.zeros((b, heads, n, n), np.float32) + 0.001
    r, c = 3, 7
    attn[:, :, 0, 1 + r * feat + c] = 1.0  # cls -> patch (r, c)
    path = str(tmp_path / "attn.jpg")
    save_batch_attention_map(images, attn, path)
    from PIL import Image

    im = np.asarray(Image.open(path)).astype(np.float32)
    assert im.shape == (feat * 4, b * feat * 4, 3)
    # hottest jet color = red end; locate max of (R - B) energy
    energy = im[..., 0] - im[..., 2]
    my, mx = np.unravel_index(np.argmax(energy), energy.shape)
    assert abs(my - r * 4) <= 4 and abs(mx - c * 4) <= 4, (my, mx)


def test_save_debug_images_all_artifacts(tmp_path):
    b, h, w, j = 2, 32, 32, 21
    hh = hw = 8
    rng = np.random.RandomState(3)
    feat = 12
    n = feat * feat + 1
    outputs = {
        "image": _normed(rng.rand(b, h, w, 3).astype(np.float32)),
        "label": np.arange(b),
        "pred_label": np.arange(b)[::-1].copy(),
        "joints": rng.rand(b, j, 2).astype(np.float32) * 24,
        "target": rng.rand(b, j, hh, hw).astype(np.float32),
        "target_weight": np.ones((b, j), np.float32),
        "heatmap": rng.rand(b, j, hh, hw).astype(np.float32),
        "attnmap": rng.rand(b, 8, n, n).astype(np.float32),
    }
    prefix = str(tmp_path / "dbg")
    save_debug_images(outputs, prefix, with_attention=True)
    for suffix in ("_gt.jpg", "_pred.jpg", "_hm_gt.jpg", "_hm_pred.jpg",
                   "_attn.jpg"):
        assert os.path.isfile(prefix + suffix), suffix
    # attention artifact only for val-style calls (reference
    # libs/vis.py:187-205)
    prefix2 = str(tmp_path / "dbg2")
    save_debug_images(outputs, prefix2, with_attention=False)
    assert not os.path.exists(prefix2 + "_attn.jpg")
