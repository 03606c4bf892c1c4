"""MultiTaskNet — GELAN encoder -> 1x1 projection -> ViT decoder.

Capability parity with reference model/multitasknet.py:8-29. NHWC,
configurable compute dtype/precision, optional Pallas attention.

Forward: images (B, H, W, 3) ->
  cls_out  (B, num_classes)
  hmap_out (B, H/4, W/4, num_joints)   [NHWC; use ``heatmaps_to_nchw``]
  attnmap  (B, heads, N, N) with N = (H/16)*(W/16) + 1.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hgr_tpu.config import ModelConfig
from hgr_tpu.models.gelan import GELANNet
from hgr_tpu.models.vit import ViT

Array = jax.Array
Dtype = Any


class MultiTaskNet(nn.Module):
    """Reference model/multitasknet.py:8-29, TPU-native."""

    num_joints: int = 21
    num_classes: int = 19
    image_size: Tuple[int, int] = (192, 192)  # (H, W)
    backbone: str = "small"
    dim: int = 256
    depth: int = 4
    heads: int = 8
    head_dim: int = 32
    mlp_dim: int = 256
    dtype: Dtype = jnp.float32
    # Decoder (proj + ViT) dtype override; None = follow ``dtype``.
    # float32 under a bf16 backbone restores classification-gradient
    # SNR in the transformer backward (see config.ModelConfig.decoder_dtype).
    decoder_dtype: Optional[Dtype] = None
    # Backbone precision scheduling: run the first ``early_units`` GELAN
    # units in ``early_dtype`` (gelan.GELANNet.early_dtype) — f32 early
    # units under a bf16 body preserve fine-grained (color-scale)
    # classification cues the bf16 path quantizes away.
    early_dtype: Optional[Dtype] = None
    early_units: int = 3
    precision: Optional[jax.lax.Precision] = None
    # True = packed Pallas core; 'split' = head-sharded Pallas core for
    # tensor-parallel meshes; False = unfused XLA chain (see
    # vit.Attention.fused).
    fused_attention: Any = True
    # Backward-pass remat of the backbone body and the pose head
    # (gelan.GELANNet.remat, vit.ViT.remat_pose_head) — memory for FLOPs.
    remat: bool = False
    # Lowering of the backbone's stride-2 convs (layers.ConvBnAct
    # stride2_impl: 'plain' | 's2d' | 'dense_grad'): same math/params.
    stride2_impl: str = "plain"

    @classmethod
    def from_config(cls, cfg: ModelConfig) -> "MultiTaskNet":
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        return cls(
            num_joints=cfg.num_joints,
            num_classes=cfg.num_classes,
            image_size=cfg.image_size,
            backbone=cfg.backbone,
            dim=cfg.dim,
            depth=cfg.depth,
            heads=cfg.heads,
            head_dim=cfg.head_dim,
            mlp_dim=cfg.mlp_dim,
            dtype=dtype,
            decoder_dtype=(None if cfg.decoder_dtype is None else
                           (jnp.bfloat16 if cfg.decoder_dtype == "bfloat16"
                            else jnp.float32)),
            early_dtype=(None if cfg.early_dtype is None else
                         (jnp.bfloat16 if cfg.early_dtype == "bfloat16"
                          else jnp.float32)),
            early_units=cfg.early_units,
            fused_attention=cfg.fused_attention,
            remat=cfg.remat,
        )

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, need_attnmap: bool = True
    ) -> Tuple[Array, Array, Optional[Array]]:
        """``need_attnmap=False`` (train/eval/serving paths that never
        consume the map) lets every attention layer take the fused
        no-map Pallas core (ops/attention_pallas.py); the returned third
        element is then None."""
        x = x.astype(self.dtype)
        feats = GELANNet(self.backbone, dtype=self.dtype,
                         precision=self.precision,
                         remat=self.remat, stride2_impl=self.stride2_impl,
                         early_dtype=self.early_dtype,
                         early_units=self.early_units,
                         name="encoder")(x, train)
        from hgr_tpu.models.layers import torch_kernel_init

        ddt = self.decoder_dtype if self.decoder_dtype is not None \
            else self.dtype
        feats = nn.Conv(self.dim, kernel_size=(1, 1), use_bias=False,
                        dtype=ddt, param_dtype=jnp.float32,
                        kernel_init=torch_kernel_init(),
                        precision=self.precision, name="proj")(feats)
        h, w = self.image_size[0] // 16, self.image_size[1] // 16
        cls_out, hmap_out, attnmap = ViT(
            num_classes=self.num_classes,
            num_joints=self.num_joints,
            feature_size=(h, w),
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            head_dim=self.head_dim,
            mlp_dim=self.mlp_dim,
            dtype=ddt,
            precision=self.precision,
            fused=self.fused_attention,
            remat_pose_head=self.remat,
            name="decoder")(feats, need_attnmap=need_attnmap)
        return cls_out, hmap_out, attnmap


def heatmaps_to_nchw(hmap_nhwc: Array) -> Array:
    """(B, H, W, J) -> (B, J, H, W) for reference-layout consumers."""
    return jnp.transpose(hmap_nhwc, (0, 3, 1, 2))


def images_to_nhwc(img_nchw: Array) -> Array:
    """(B, 3, H, W) -> (B, H, W, 3)."""
    return jnp.transpose(img_nchw, (0, 2, 3, 1))
