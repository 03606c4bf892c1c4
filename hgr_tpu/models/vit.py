"""ViT decoder — cls-token transformer + simple pose decoder, Flax/NHWC.

Capability parity with reference model/transformer.py:29-152:
  * fixed (non-learned) 2D sin-cos positional embedding added to patch
    tokens BEFORE the cls token is prepended (transformer.py:129-139);
  * pre-LN attention (qkv and out-proj without bias) returning the
    last layer's post-softmax attention map (transformer.py:45-96);
  * pre-LN MLP with exact (erf) GELU (transformer.py:29-41 — torch
    nn.GELU default is the erf form, NOT the tanh approximation);
  * cls head = LayerNorm + Linear (transformer.py:113-116);
  * pose decoder = align-corners bilinear x4 upsample -> ReLU -> 1x1 conv
    (transformer.py:118-127,146-150).

TPU design notes: softmax and LayerNorm statistics are computed in
float32 even when compute dtype is bfloat16. Attention routes by need:
when the caller does NOT need the attention map (``need_attnmap=False``
— training, eval, serving), every layer takes the fused qkv-native
Pallas core (ops/attention_pallas.py: no N×N HBM intermediates, no
heads-first transposes; fwd +40% at B=4096, BENCH_LOG.md round 2b);
when the map IS needed, only the LAST layer — the one whose map the
reference consumes (transformer.py:90-96) — runs the unfused XLA chain
that materializes it.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hgr_tpu.models.layers import torch_bias_init, torch_kernel_init
from hgr_tpu.ops.attention_pallas import (
    _xla_attention_core,
    fused_attention_qkv,
    fused_attention_split,
    split_heads,
)
from hgr_tpu.ops.posemb import pos_emb_sincos_2d
from hgr_tpu.ops.resize import upsample_bilinear_align_corners

Array = jax.Array
Dtype = Any


class FeedForward(nn.Module):
    """Pre-LN MLP (reference model/transformer.py:29-41)."""

    dim: int
    hidden_dim: int
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, precision=self.precision,
                     kernel_init=torch_kernel_init(),
                     bias_init=torch_bias_init(self.dim),
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     precision=self.precision,
                     kernel_init=torch_kernel_init(),
                     bias_init=torch_bias_init(self.hidden_dim),
                     name="fc2")(x)
        return x


class Attention(nn.Module):
    """Pre-LN multi-head attention returning the attention map
    (reference model/transformer.py:45-77)."""

    dim: int
    heads: int
    head_dim: int
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    # Fused-attention routing:
    #   True    — packed-qkv Pallas core (single device / data-parallel
    #             meshes; batch-dim partitioning only).
    #   'split' — same kernel fed q, k, v as separate operands with a
    #             head-sharded partitioning rule: tensor-parallel meshes
    #             (qkv column-sharded on 'model') keep the fused core,
    #             each device computing its local head group
    #             (ops/attention_pallas.py:fused_attention_split).
    #   False   — unfused XLA chain (GSPMD shards it freely; the only
    #             choice when heads don't divide the model axis).
    fused: Any = True

    @nn.compact
    def __call__(self, x: Array,
                 need_map: bool = True) -> Tuple[Array, Optional[Array]]:
        b, n, _ = x.shape
        inner = self.heads * self.head_dim
        scale = self.head_dim**-0.5

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, precision=self.precision,
                       kernel_init=torch_kernel_init(), name="to_qkv")(h)

        if need_map or not self.fused:
            # unfused chain (shared with the kernel parity tests): used
            # when the post-softmax map is a real output (reference
            # transformer.py:62-77 / vis.py attention overlays) or when
            # fused attention is disabled (tensor-parallel meshes — see
            # the ``fused`` field note).
            q, k, v = split_heads(qkv, self.heads, self.head_dim)
            out, attn = _xla_attention_core(q, k, v, scale,
                                            self.precision,
                                            return_attn=True)
            if not need_map:
                attn = None
            out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        elif self.fused == "split":
            # tensor-parallel form: the packed dim can't be head-sharded
            # (contiguous 'model' sharding would mix q and k columns),
            # but each THIRD is head-aligned — split here, and the
            # head-partitioned rule runs the kernel per local head group
            attn = None
            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = fused_attention_split(q, k, v, self.heads, self.head_dim,
                                        scale, False, self.precision)
        else:
            # fused Pallas core on TPU, fed the packed qkv directly: the
            # N×N score/attention tensors never reach HBM and the
            # heads-first transposes (4× tile-padded layouts) disappear
            # (ops/attention_pallas.py — most of the per-layer cost at
            # B=4096 was exactly that traffic)
            attn = None
            out = fused_attention_qkv(qkv, self.heads, self.head_dim,
                                      scale, False, self.precision)
        # project_out is always true for the reference config
        # (heads=8, head_dim=32, dim=256 -> transformer.py:50-63).
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, precision=self.precision,
                       kernel_init=torch_kernel_init(), name="to_out")(out)
        return out, attn


class Transformer(nn.Module):
    """Stack of depth x (attention + MLP) with residuals; returns the
    last layer's attention map (reference model/transformer.py:80-96)."""

    dim: int
    depth: int
    heads: int
    head_dim: int
    mlp_dim: int
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    fused: Any = True  # see Attention.fused

    @nn.compact
    def __call__(self, x: Array,
                 need_attnmap: bool = True) -> Tuple[Array, Optional[Array]]:
        attnmap = None
        for i in range(self.depth):
            # Only the LAST layer's map is ever consumed (reference
            # transformer.py:90-96 keeps just the final attn); earlier
            # layers always take the fused no-map path.
            last = i == self.depth - 1
            message, attnmap = Attention(
                self.dim, self.heads, self.head_dim, dtype=self.dtype,
                precision=self.precision, fused=self.fused,
                name=f"layers_{i}_attn")(x, need_map=last and need_attnmap)
            x = message + x
            x = FeedForward(self.dim, self.mlp_dim, dtype=self.dtype,
                            precision=self.precision,
                            name=f"layers_{i}_ff")(x) + x
        return x, attnmap


class ViT(nn.Module):
    """ViT decoder head (reference model/transformer.py:99-152).

    Input: (B, h, w, dim) projected backbone features (NHWC).
    Output: (cls_out (B, num_classes),
             hmap_out (B, 4h, 4w, num_joints)  [NHWC],
             attnmap (B, heads, 1+h*w, 1+h*w)).
    """

    num_classes: int
    num_joints: int
    feature_size: Tuple[int, int]  # (h, w)
    dim: int
    depth: int
    heads: int
    head_dim: int
    mlp_dim: int
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    fused: Any = True  # see Attention.fused
    # Rematerialize the pose head (x4 upsample -> ReLU -> 1x1 conv) in
    # the backward: its (B, 4h, 4w, dim) intermediates are the largest
    # decoder tensors (~1-2 GB at B=1024) and recompute from the
    # (B, h, w, dim) tokens costs two small matmuls + a 1x1 conv.
    remat_pose_head: bool = False

    @nn.compact
    def __call__(self, x: Array,
                 need_attnmap: bool = True
                 ) -> Tuple[Array, Array, Optional[Array]]:
        b, h, w, c = x.shape
        assert (h, w) == tuple(self.feature_size)

        tokens = x.reshape(b, h * w, c)
        pe = jnp.asarray(pos_emb_sincos_2d(h, w, self.dim))
        tokens = tokens + pe.astype(tokens.dtype)

        cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, self.dim),
            jnp.float32)
        cls_tokens = jnp.broadcast_to(
            cls_token.astype(tokens.dtype), (b, 1, self.dim))
        tokens = jnp.concatenate([cls_tokens, tokens], axis=1)

        tokens, attnmap = Transformer(
            self.dim, self.depth, self.heads, self.head_dim, self.mlp_dim,
            dtype=self.dtype, precision=self.precision, fused=self.fused,
            name="transformer")(tokens, need_attnmap=need_attnmap)

        cls_feat = tokens[:, 0]
        hmap_feat = tokens[:, 1:]

        cls_out = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, name="mlp_head_norm")(cls_feat)
        cls_out = nn.Dense(
            self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
            precision=self.precision, kernel_init=torch_kernel_init(),
            bias_init=torch_bias_init(self.dim), name="mlp_head_fc")(cls_out)

        # align_corners=True x4 bilinear as two MXU matmuls (ops/resize.py),
        # then ReLU -> 1x1 conv (reference transformer.py:146-150).
        # The upsample rides the module's compute dtype/precision — in bf16
        # mode that's a single-pass MXU matmul instead of 6-pass f32.
        up_precision = (self.precision if self.precision is not None
                        else (jax.lax.Precision.HIGHEST
                              if self.dtype == jnp.float32 else None))

        def _pose_head(mdl, hmap_feat):
            hmap = hmap_feat.reshape(b, h, w, mdl.dim)
            hmap = upsample_bilinear_align_corners(
                hmap, 4, precision=up_precision,
                compute_dtype=jnp.float32 if mdl.dtype == jnp.float32
                else mdl.dtype)
            hmap = nn.relu(hmap)
            return nn.Conv(
                mdl.num_joints, kernel_size=(1, 1), use_bias=True,
                dtype=mdl.dtype, param_dtype=jnp.float32,
                precision=mdl.precision, kernel_init=torch_kernel_init(),
                bias_init=torch_bias_init(mdl.dim),
                name="simple_decoder_conv")(hmap)

        if self.remat_pose_head:
            _pose_head = nn.remat(_pose_head)
        hmap_out = _pose_head(self, hmap_feat)

        return cls_out, hmap_out.astype(jnp.float32), attnmap
