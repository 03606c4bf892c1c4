"""GELAN (CSP-ELAN) backbone — Flax/NHWC re-design.

Capability parity with reference model/gelan.py:124-176:
  * ``GELANBlock``: 1x1 in-conv, channel chunk-2, two sequential block
    chains, 4-way concat, 1x1 out-conv (reference gelan.py:124-142).
  * ``GELANNet``: stem of two stride-2 convs + 3 stages of
    [GELAN block, stride-2 down-conv], output stride 16, 512 channels
    (reference gelan.py:145-176; stage 4 is commented out upstream and
    therefore omitted here too).
  * specs: small = 1 ResBasicBlock per chain, large = 2
    (reference gelan.py:148-151).

All convs carry the configured compute dtype (bf16 on TPU) and fuse with
BN+SiLU under XLA; channel counts are multiples of 64 so every conv tiles
cleanly onto the 128x128 MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hgr_tpu.models.layers import ConvBnAct, ResBasicBlock, ResBottleneck

Array = jax.Array
Dtype = Any

GELAN_SPEC = {
    # name -> (block type, blocks-per-chain per stage)
    "small": ("basic", (1, 1, 1, 1)),
    "large": ("basic", (2, 2, 2, 2)),
}


class GELANBlock(nn.Module):
    """CSP-ELAN block (reference model/gelan.py:124-142).

    y = [a, b] = chunk2(cv1(x)); y += [chain1(b), chain2(chain1(b))];
    out = cv4(concat(y)).
    """

    c_out: int
    c_hid1: int
    c_hid2: int
    block: str = "basic"
    nblocks: int = 1
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    def _make_block(self, features: int, name: str):
        cls = ResBasicBlock if self.block == "basic" else ResBottleneck
        return cls(features, dtype=self.dtype, precision=self.precision,
                   name=name)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y0 = ConvBnAct(self.c_hid1, 1, 1, dtype=self.dtype,
                       precision=self.precision, name="cv1")(x, train)
        half = self.c_hid1 // 2
        a, b = y0[..., :half], y0[..., half:]
        c = b
        for i in range(self.nblocks):
            c = self._make_block(self.c_hid2, f"cv2_{i}")(c, train)
        d = c
        for i in range(self.nblocks):
            d = self._make_block(self.c_hid2, f"cv3_{i}")(d, train)
        y = jnp.concatenate([a, b, c, d], axis=-1)
        return ConvBnAct(self.c_out, 1, 1, dtype=self.dtype,
                         precision=self.precision, name="cv4")(y, train)


class GELANNet(nn.Module):
    """GELAN backbone (reference model/gelan.py:145-176).

    Input (B, H, W, 3) -> features (B, H/16, W/16, 512).
    """

    variant: str = "small"
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    # Rematerialize the whole backbone body in the backward pass: only
    # the input image and the output features stay live across the
    # forward; every internal activation (the stem + ELAN internals
    # dominate the train step's HBM footprint, ~7 GB at B=1024/192px in
    # bf16) is recomputed during the backward for one extra backbone
    # forward (~15% of total step FLOPs). The canonical jax.checkpoint
    # trade that lets a big batch share the chip with an HBM-resident
    # dataset cache (data/device_cache.py). Param tree and numerics are
    # unchanged (function-level nn.remat, children keep their names;
    # tests/test_model.py pins grad equality).
    remat: bool = False
    # Lowering for the four stride-2 convs (layers.ConvBnAct
    # stride2_impl): 'plain', 's2d' (space-to-depth), or 'dense_grad'
    # (phase-decomposed input gradient). Identical math + param tree.
    stride2_impl: str = "plain"
    # Precision scheduling: run the first ``early_units`` of the 7 units
    # [conv1, conv2, cspelan1, down1, cspelan2, down2, cspelan3] in
    # ``early_dtype`` (typically float32 under a bf16 body). Round-4
    # finding: fine-grained color-keyed classification signal is
    # quantized away by a bf16 backbone while pose is untouched; the
    # early high-resolution units are where that cue is extracted
    # (BENCH_LOG round 4). None = uniform dtype (default).
    early_dtype: Optional[Dtype] = None
    early_units: int = 3

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        block, layers = GELAN_SPEC[self.variant]

        def unit_kw(i: int, stride2: bool):
            d = (self.early_dtype
                 if self.early_dtype is not None and i < self.early_units
                 else self.dtype)
            kw = dict(dtype=d, precision=self.precision)
            if stride2:
                kw["stride2_impl"] = self.stride2_impl
            return kw

        def _body(mdl, x, train):
            x = ConvBnAct(64, 3, 2, name="conv1",
                          **unit_kw(0, True))(x, train)
            x = ConvBnAct(128, 3, 2, name="conv2",
                          **unit_kw(1, True))(x, train)
            x = GELANBlock(128, 128, 64, block, layers[0], name="cspelan1",
                           **unit_kw(2, False))(x, train)
            x = ConvBnAct(256, 3, 2, name="down1",
                          **unit_kw(3, True))(x, train)
            x = GELANBlock(256, 256, 128, block, layers[1], name="cspelan2",
                           **unit_kw(4, False))(x, train)
            x = ConvBnAct(512, 3, 2, name="down2",
                          **unit_kw(5, True))(x, train)
            return GELANBlock(512, 512, 256, block, layers[2],
                              name="cspelan3", **unit_kw(6, False))(x, train)

        if self.remat:
            _body = nn.remat(_body, static_argnums=(2,))
        return _body(self, x, train)
