"""On-device metrics: PCK pose accuracy + streaming confusion/macro-F1.

The reference computes BOTH metrics on host EVERY step — sklearn macro-F1
and numpy PCK on `.detach().cpu()` tensors (reference train.py:67-73),
forcing a device->host sync per step. Here both are pure jnp and live
inside the jitted step; only tiny accumulator scalars ever reach the host.

``pck_accuracy`` mirrors reference libs/metrics.py:6-62: decode argmax
peaks from predicted AND ground-truth heatmaps, L2 distance normalized by
[h, w]/10, a joint counts when its GT peak coords are both > 1, per-joint
accuracy = fraction of valid distances < 0.5, averaged over joints that
have >= 1 valid sample.

Macro-F1 is accumulated as a (C, C) confusion matrix (one-hot matmul
scatter) and finalized with ``macro_f1_from_confusion`` — identical to
sklearn's epoch-level macro F1 (the reference's per-batch F1 logging is a
noisy estimate of the same quantity; its test-time F1 at train.py:177 is
epoch-level like ours).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from hgr_tpu.ops.heatmap import get_max_preds

Array = jax.Array


def pck_accuracy(
    output: Array, target: Array, thr: float = 0.5,
    sample_mask: Array = None
) -> Tuple[Array, Array, Array, Array]:
    """PCK@thr from heatmaps (reference libs/metrics.py:31-62).

    Args:
      output, target: (B, J, H, W) heatmaps.
      sample_mask: optional (B,) mask; samples with mask == 0 (tail-batch
        padding) contribute no joints, exactly as if absent.
    Returns:
      acc: (J + 1,) — acc[0] is the average, acc[1:] per-joint (-1 if no
        valid samples for that joint).
      avg_acc: scalar — mean of valid per-joint accuracies (0 if none).
      cnt: scalar int — number of joints with >= 1 valid sample.
      pred: (B, J, 2) decoded predicted peaks.
    """
    output = jnp.asarray(output, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    h, w = output.shape[2], output.shape[3]
    j = output.shape[1]

    pred, _ = get_max_preds(output)  # (B, J, 2)
    gt, _ = get_max_preds(target)

    # normalize = [h, w] / 10 applied to (x, y) — note the reference applies
    # h to x and w to y (libs/metrics.py:46); preserved verbatim.
    norm = jnp.array([h / 10.0, w / 10.0], jnp.float32)
    valid = (gt[..., 0] > 1.0) & (gt[..., 1] > 1.0)  # (B, J)
    if sample_mask is not None:
        valid = valid & (jnp.asarray(sample_mask) > 0)[:, None]
    dists = jnp.linalg.norm((pred - gt) / norm, axis=-1)  # (B, J)

    valid_f = valid.astype(jnp.float32)
    num_valid = jnp.sum(valid_f, axis=0)  # (J,)
    below = jnp.sum(((dists < thr) & valid).astype(jnp.float32), axis=0)
    per_joint = jnp.where(num_valid > 0, below / jnp.maximum(num_valid, 1.0), -1.0)

    joint_has = (num_valid > 0).astype(jnp.float32)
    cnt = jnp.sum(joint_has)
    avg_acc = jnp.where(
        cnt > 0, jnp.sum(jnp.where(per_joint >= 0, per_joint, 0.0)) / jnp.maximum(cnt, 1.0), 0.0
    )
    acc0 = jnp.where(cnt > 0, avg_acc, 0.0)
    acc = jnp.concatenate([acc0[None], per_joint])
    return acc, avg_acc, cnt.astype(jnp.int32), pred


def confusion_update(conf: Array, labels: Array, preds: Array,
                     sample_mask: Array = None) -> Array:
    """Accumulate a (C, C) confusion matrix: conf[label, pred] += 1.

    Implemented as a one-hot matmul so it stays a dense MXU-friendly op
    inside jit (no host scatter). ``sample_mask`` zeroes padded samples'
    rows so every real sample counts exactly once across an epoch.
    """
    c = conf.shape[0]
    lab = jax.nn.one_hot(labels, c, dtype=jnp.float32)  # (B, C)
    prd = jax.nn.one_hot(preds, c, dtype=jnp.float32)  # (B, C)
    if sample_mask is not None:
        lab = lab * jnp.asarray(sample_mask, jnp.float32)[:, None]
    return conf + jnp.matmul(lab.T, prd, precision=jax.lax.Precision.HIGHEST)


def macro_f1_from_confusion(conf: Array) -> Array:
    """Macro F1 over classes from a (C, C) confusion matrix (rows = true).

    Matches sklearn's `f1_score(average='macro')` with zero_division=0
    (classes absent from both pred and true contribute F1 = 0, as sklearn
    does when labels cover all classes).
    """
    conf = jnp.asarray(conf, jnp.float32)
    tp = jnp.diagonal(conf)
    fp = jnp.sum(conf, axis=0) - tp
    fn = jnp.sum(conf, axis=1) - tp
    denom = 2.0 * tp + fp + fn
    f1 = jnp.where(denom > 0, 2.0 * tp / jnp.maximum(denom, 1.0), 0.0)
    return jnp.mean(f1)


def batch_macro_f1(labels: Array, preds: Array, num_classes: int,
                   sample_mask: Array = None) -> Array:
    """Per-batch macro F1 (the quantity the reference logs each step,
    train.py:67-69)."""
    conf = confusion_update(
        jnp.zeros((num_classes, num_classes), jnp.float32), labels, preds,
        sample_mask=sample_mask,
    )
    return macro_f1_from_confusion(conf)


@dataclasses.dataclass
class ConfusionAccumulator:
    """Host-side convenience wrapper for streaming epoch metrics."""

    num_classes: int

    def __post_init__(self):
        import numpy as np

        self.conf = np.zeros((self.num_classes, self.num_classes), dtype=np.float64)

    def update(self, labels, preds) -> None:
        import numpy as np

        labels = np.asarray(labels).reshape(-1)
        preds = np.asarray(preds).reshape(-1)
        np.add.at(self.conf, (labels, preds), 1.0)

    def macro_f1(self) -> float:
        return float(macro_f1_from_confusion(jnp.asarray(self.conf)))
