"""2D sin-cos positional embedding (reference model/transformer.py:9-26).

Non-learned; computed once at trace time with numpy so it constant-folds
into the compiled graph. Layout matches the reference exactly:
pe = concat(sin(x*w), cos(x*w), sin(y*w), cos(y*w)) over dim//4 freqs,
rows ordered row-major over the (h, w) grid.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=16)
def pos_emb_sincos_2d(
    h: int, w: int, dim: int, temperature: float = 10000.0
) -> np.ndarray:
    assert dim % 4 == 0, "dimension must be divisible by 4"
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    omega = np.arange(dim // 4, dtype=np.float64)
    omega = 1.0 / (temperature**omega)
    yv = y.reshape(-1)[:, None] * omega[None, :]
    xv = x.reshape(-1)[:, None] * omega[None, :]
    pe = np.concatenate(
        [np.sin(xv), np.cos(xv), np.sin(yv), np.cos(yv)], axis=1
    )
    return pe.astype(np.float32)
