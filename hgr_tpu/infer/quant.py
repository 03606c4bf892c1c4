"""Post-training int8 quantization of the GELAN backbone for serving.

Beyond-reference capability (the reference serves fp32 through
onnxruntime, export.py:95-106): on TPU the backbone's big spatial convs
are HBM-bound, so int8 weights + int8 activations halve the bytes and
run the MXU in int8. The ViT decoder stays bf16 (its 145-token matmuls
are tiny and latency-bound, not bandwidth-bound), so quantization
touches exactly the ConvBnAct stack. Measured shape-level and
whole-model numbers: BENCH_LOG 'int8 PTQ serving path'.

Scheme (standard symmetric PTQ):
  * BatchNorm folded into the conv: W' = W * gamma/sqrt(var+eps),
    b' = beta - mean * gamma/sqrt(var+eps)  (inference-mode BN is affine).
  * Weights: per-output-channel symmetric int8 (scale = absmax/127).
  * Activations: per-tensor symmetric int8 with scales calibrated from
    representative batches (absmax observed at each conv input — the
    `quant_stats` sow hook in models/layers.py:ConvBnAct).
  * Conv accumulates exactly in int32 on the MXU; dequant + bias + SiLU
    stay f32/bf16 elementwise and fuse under XLA.

Flow:
  stats = calibrate_act_scales(model, variables, batches)
  qvars = quantize_variables(variables, stats)
  logits, hmap, _ = model.apply(qvars, x, train=False)   # int8 backbone
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5  # models/layers.py ConvBnAct nn.BatchNorm epsilon


def calibrate_act_scales(
    model,
    variables: Dict[str, Any],
    batches: Iterable[np.ndarray],
    **apply_kwargs,
) -> Dict[str, Any]:
    """Run calibration batches through the model, collecting the absmax
    of every ConvBnAct input (the `quant_stats` sow hook). Returns the
    merged stats tree (module-path dict with 'in_absmax' leaves)."""
    merged: Optional[Dict[str, Any]] = None
    for batch in batches:
        _, state = model.apply(
            variables, jnp.asarray(batch), train=False,
            mutable=["quant_stats"], **apply_kwargs)
        stats = jax.tree_util.tree_map(np.asarray, state["quant_stats"])
        if merged is None:
            merged = stats
        else:
            merged = jax.tree_util.tree_map(np.maximum, merged, stats)
    if merged is None:
        raise ValueError("calibrate_act_scales needs at least one batch")
    return merged


def _is_convbn(node: Any) -> bool:
    return (isinstance(node, dict) and "conv" in node and "bn" in node
            and isinstance(node["conv"], dict)
            and "kernel" in node["conv"])


def quantize_variables(
    variables: Dict[str, Any],
    act_stats: Dict[str, Any],
    eps: float = BN_EPS,
) -> Dict[str, Any]:
    """Build int8 'quant' entries for every calibrated ConvBnAct.

    Returns a new variables dict = original + a 'quant' collection that
    mirrors the module tree. ConvBnAct modules that appear in both the
    params tree and `act_stats` switch to the int8 path at apply time
    (models/layers.py ConvBnAct._quantized); everything else (ViT, proj,
    pose head) keeps its float path untouched.
    """
    params = variables["params"]
    bstats = variables["batch_stats"]

    def walk(p: Dict[str, Any], b: Dict[str, Any], s: Dict[str, Any]
             ) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for key, node in p.items():
            if key not in s:
                continue  # module never calibrated (e.g. not a ConvBnAct)
            if _is_convbn(node):
                absmax = float(np.asarray(s[key]["in_absmax"]))
                out[key] = _quantize_convbn(node, b[key], absmax, eps)
            elif isinstance(node, dict):
                sub = walk(node, b.get(key, {}), s[key])
                if sub:
                    out[key] = sub
        return out

    if _is_convbn(params):  # the model IS a single ConvBnAct
        quant = _quantize_convbn(
            params, bstats, float(np.asarray(act_stats["in_absmax"])), eps)
    else:
        quant = walk(params, bstats, act_stats)
    if not quant:
        raise ValueError("no ConvBnAct modules matched the calibration "
                         "stats — did calibration run on this model?")
    new_vars = dict(variables)
    new_vars["quant"] = quant
    return new_vars


def _quantize_convbn(p: Dict[str, Any], b: Dict[str, Any], absmax: float,
                     eps: float) -> Dict[str, np.ndarray]:
    w = np.asarray(p["conv"]["kernel"], np.float32)  # (k, k, Cin, Cout)
    gamma = np.asarray(p["bn"]["scale"], np.float32)
    beta = np.asarray(p["bn"]["bias"], np.float32)
    mean = np.asarray(b["bn"]["mean"], np.float32)
    var = np.asarray(b["bn"]["var"], np.float32)

    a = gamma / np.sqrt(var + eps)  # (Cout,)
    w_folded = w * a  # broadcast over the last (out-channel) axis
    bias = beta - mean * a

    w_scale = np.abs(w_folded).max(axis=(0, 1, 2)) / 127.0  # (Cout,)
    w_scale = np.maximum(w_scale, 1e-12)
    kernel_q = np.clip(np.round(w_folded / w_scale), -127, 127
                       ).astype(np.int8)

    act_scale = np.float32(max(absmax, 1e-12) / 127.0)
    return {
        "kernel_q": kernel_q,
        "act_scale": act_scale,
        "out_scale": (act_scale * w_scale).astype(np.float32),
        "bias": bias.astype(np.float32),
    }


def quantize_model(
    model,
    variables: Dict[str, Any],
    calibration_batches: Iterable[np.ndarray],
    **apply_kwargs,
) -> Dict[str, Any]:
    """One-call PTQ: calibrate + fold + quantize. Returns variables with
    the 'quant' collection added."""
    stats = calibrate_act_scales(model, variables, calibration_batches,
                                 **apply_kwargs)
    return quantize_variables(variables, stats)
