"""Losses — exact semantics of the reference, fused and batched.

``joints_mse_loss`` reproduces reference libs/loss.py:4-30 (JointsMSELoss):
per joint j, 0.5 * mean over (batch, pixels) of
(w_bj * pred - w_bj * gt)^2, summed over joints and divided by num_joints.
The reference's Python per-joint loop collapses to one fused reduction.

``classification_loss`` reproduces reference libs/loss.py:33-40: mean
softmax cross-entropy over integer labels.

``multitask_loss`` combines them with the 0.001 class weight used by the
trainer (reference train.py:63-64).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _masked_mean(per_sample: Array, sample_mask: Optional[Array]) -> Array:
    """Mean over the batch, restricted to samples with mask > 0.

    With ``sample_mask=None`` (or an all-ones mask) this is the plain
    batch mean — identical to the reference's full-batch reductions. The
    mask path makes tail-batch padding contribute exactly zero (the
    reference never pads: its eval DataLoaders use drop_last=False,
    libs/load.py:289-305)."""
    if sample_mask is None:
        return jnp.mean(per_sample)
    m = jnp.asarray(sample_mask, jnp.float32)
    return jnp.sum(per_sample * m) / jnp.maximum(jnp.sum(m), 1.0)


def joints_mse_loss(
    output: Array,
    target: Array,
    target_weight: Optional[Array] = None,
    sample_mask: Optional[Array] = None,
) -> Array:
    """Masked per-joint MSE heatmap loss.

    Args:
      output, target: (B, J, H, W) — heatmaps.
      target_weight: (B, J) or (B, J, 1) visibility mask, or None.
      sample_mask: optional (B,) mask excluding padded samples.
    Returns scalar float32 loss.
    """
    output = jnp.asarray(output, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    b, j = output.shape[0], output.shape[1]
    pred = output.reshape(b, j, -1)
    gt = target.reshape(b, j, -1)
    if target_weight is not None:
        w = jnp.asarray(target_weight, jnp.float32).reshape(b, j, 1)
        pred = pred * w
        gt = gt * w
    # 0.5 * mean over (batch, pixels) per joint, summed over joints / J
    # (reference libs/loss.py:10-30) == batch mean of the per-sample loss
    # (1/J) sum_j 0.5 * mean_pixels(...); the latter form supports the
    # sample mask.
    per_sample = 0.5 * jnp.mean(jnp.mean((pred - gt) ** 2, axis=-1), axis=-1)
    return _masked_mean(per_sample, sample_mask)


def classification_loss(
    logits: Array, labels: Array, sample_mask: Optional[Array] = None
) -> Array:
    """Mean cross-entropy over integer labels. logits (B, C), labels (B,)."""
    logits = jnp.asarray(logits, jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return _masked_mean(nll, sample_mask)


def multitask_loss(
    logits: Array,
    heatmaps: Array,
    labels: Array,
    target: Array,
    target_weight: Optional[Array],
    class_loss_weight: float = 0.001,
    sample_mask: Optional[Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Total loss = class_loss * w + joints_loss (reference train.py:63-75)."""
    class_loss = classification_loss(
        logits, labels, sample_mask) * class_loss_weight
    joints_loss = joints_mse_loss(
        heatmaps, target, target_weight, sample_mask)
    total = class_loss + joints_loss
    return total, {
        "total_loss": total,
        "class_loss": class_loss,
        "joints_loss": joints_loss,
    }
