"""Port reference (torch) MultiTaskNet checkpoints into hgr_tpu Flax params.

Capability parity with the reference's checkpoint-consumption path
(reference export.py:34-40: load Lightning ckpt ``state_dict``, strip the
``model.`` prefix, strict load). This module converts such a state dict to
the {params, batch_stats} variables of ``hgr_tpu.models.MultiTaskNet``:

  * torch Conv2d weight (O, I, kH, kW)  -> flax kernel (kH, kW, I, O)
  * torch Linear weight (O, I)          -> flax kernel (I, O)
  * torch BatchNorm weight/bias/running_mean/running_var
        -> flax bn {scale, bias} params + {mean, var} batch_stats

Used by tests for numerical weight-port parity (SURVEY.md §4c) and by the
CLI converter for users migrating reference checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _linear(w) -> np.ndarray:
    return _np(w).transpose(1, 0)


def _set(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def strip_lightning_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Strip the Lightning ``model.`` prefix (reference export.py:36-39)."""
    return {k.replace("model.", "", 1) if k.startswith("model.") else k: v
            for k, v in state_dict.items()}


def _port_convbn(sd: Mapping[str, Any], tname: str, params: Dict, stats: Dict,
                 fname: str) -> None:
    """Port one reference Conv (conv+bn) block (model/gelan.py:18-56)."""
    _set(params, f"{fname}/conv/kernel", _conv(sd[f"{tname}.conv.weight"]))
    _set(params, f"{fname}/bn/scale", _np(sd[f"{tname}.bn.weight"]))
    _set(params, f"{fname}/bn/bias", _np(sd[f"{tname}.bn.bias"]))
    _set(stats, f"{fname}/bn/mean", _np(sd[f"{tname}.bn.running_mean"]))
    _set(stats, f"{fname}/bn/var", _np(sd[f"{tname}.bn.running_var"]))


def _port_resblock(sd, tname: str, params: Dict, stats: Dict, fname: str) -> None:
    """Port one ResBasicBlock (model/gelan.py:59-87)."""
    _port_convbn(sd, f"{tname}.cv1", params, stats, f"{fname}/cv1")
    _port_convbn(sd, f"{tname}.cv2", params, stats, f"{fname}/cv2")
    if f"{tname}.downsample.conv.weight" in sd:
        _port_convbn(sd, f"{tname}.downsample", params, stats,
                     f"{fname}/downsample")


def _port_gelan_block(sd, tname: str, params: Dict, stats: Dict, fname: str,
                      nblocks: int) -> None:
    """Port one GELANBlock (model/gelan.py:124-142)."""
    _port_convbn(sd, f"{tname}.cv1", params, stats, f"{fname}/cv1")
    for i in range(nblocks):
        _port_resblock(sd, f"{tname}.cv2.{i}", params, stats,
                       f"{fname}/cv2_{i}")
        _port_resblock(sd, f"{tname}.cv3.{i}", params, stats,
                       f"{fname}/cv3_{i}")
    _port_convbn(sd, f"{tname}.cv4", params, stats, f"{fname}/cv4")


def port_multitasknet(
    state_dict: Mapping[str, Any],
    depth: int = 4,
    nblocks: int = 1,
) -> Dict[str, Any]:
    """Convert a reference MultiTaskNet state dict to flax variables.

    Args:
      state_dict: torch state dict with reference names (``encoder.*``,
        ``proj.*``, ``decoder.*``), Lightning prefix already stripped.
      depth: transformer depth (reference hard-codes 4,
        multitasknet.py:18).
      nblocks: ResBasicBlocks per GELAN chain (1 for 'small').

    Returns:
      {'params': ..., 'batch_stats': ...} pytree for
      ``MultiTaskNet.apply``.
    """
    sd = state_dict
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # GELAN encoder (model/gelan.py:145-176).
    enc = "encoder"
    _port_convbn(sd, f"{enc}.conv1", params, stats, "encoder/conv1")
    _port_convbn(sd, f"{enc}.conv2", params, stats, "encoder/conv2")
    _port_gelan_block(sd, f"{enc}.cspelan1", params, stats,
                      "encoder/cspelan1", nblocks)
    _port_convbn(sd, f"{enc}.down1", params, stats, "encoder/down1")
    _port_gelan_block(sd, f"{enc}.cspelan2", params, stats,
                      "encoder/cspelan2", nblocks)
    _port_convbn(sd, f"{enc}.down2", params, stats, "encoder/down2")
    _port_gelan_block(sd, f"{enc}.cspelan3", params, stats,
                      "encoder/cspelan3", nblocks)

    # 1x1 projection (model/multitasknet.py:13).
    _set(params, "proj/kernel", _conv(sd["proj.weight"]))

    # ViT decoder (model/transformer.py:99-127).
    _set(params, "decoder/cls_token", _np(sd["decoder.cls_token"]))
    for i in range(depth):
        attn = f"decoder.transformer.layers.{i}.0"
        fa = f"decoder/transformer/layers_{i}_attn"
        _set(params, f"{fa}/norm/scale", _np(sd[f"{attn}.norm.weight"]))
        _set(params, f"{fa}/norm/bias", _np(sd[f"{attn}.norm.bias"]))
        _set(params, f"{fa}/to_qkv/kernel", _linear(sd[f"{attn}.to_qkv.weight"]))
        _set(params, f"{fa}/to_out/kernel", _linear(sd[f"{attn}.to_out.weight"]))

        ff = f"decoder.transformer.layers.{i}.1.net"
        fb = f"decoder/transformer/layers_{i}_ff"
        _set(params, f"{fb}/norm/scale", _np(sd[f"{ff}.0.weight"]))
        _set(params, f"{fb}/norm/bias", _np(sd[f"{ff}.0.bias"]))
        _set(params, f"{fb}/fc1/kernel", _linear(sd[f"{ff}.1.weight"]))
        _set(params, f"{fb}/fc1/bias", _np(sd[f"{ff}.1.bias"]))
        _set(params, f"{fb}/fc2/kernel", _linear(sd[f"{ff}.4.weight"]))
        _set(params, f"{fb}/fc2/bias", _np(sd[f"{ff}.4.bias"]))

    # Heads (model/transformer.py:113-127).
    _set(params, "decoder/mlp_head_norm/scale", _np(sd["decoder.mlp_head.0.weight"]))
    _set(params, "decoder/mlp_head_norm/bias", _np(sd["decoder.mlp_head.0.bias"]))
    _set(params, "decoder/mlp_head_fc/kernel", _linear(sd["decoder.mlp_head.1.weight"]))
    _set(params, "decoder/mlp_head_fc/bias", _np(sd["decoder.mlp_head.1.bias"]))
    _set(params, "decoder/simple_decoder_conv/kernel",
         _conv(sd["decoder.simple_decoder.1.weight"]))
    _set(params, "decoder/simple_decoder_conv/bias",
         _np(sd["decoder.simple_decoder.1.bias"]))

    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str, **kwargs) -> Dict[str, Any]:
    """Load a Lightning .ckpt file and port it (reference export.py:31-40)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    return port_multitasknet(strip_lightning_prefix(sd), **kwargs)
