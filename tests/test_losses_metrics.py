"""Golden tests: losses vs the torch reference formulas; metrics vs
numpy/sklearn references (libs/loss.py, libs/metrics.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hgr_tpu.ops.losses import (
    classification_loss,
    joints_mse_loss,
    multitask_loss,
)
from hgr_tpu.ops.metrics import (
    batch_macro_f1,
    confusion_update,
    macro_f1_from_confusion,
    pck_accuracy,
)

torch = pytest.importorskip("torch")


def _torch_joints_mse(output, target, target_weight, use_tw=True):
    """Torch re-derivation of reference libs/loss.py:4-30."""
    import torch.nn as nn

    criterion = nn.MSELoss(reduction="mean")
    output = torch.as_tensor(output)
    target = torch.as_tensor(target)
    target_weight = torch.as_tensor(target_weight)
    batch_size, num_joints = output.shape[:2]
    heatmaps_pred = output.reshape((batch_size, num_joints, -1)).split(1, 1)
    heatmaps_gt = target.reshape((batch_size, num_joints, -1)).split(1, 1)
    loss = 0
    for i in range(num_joints):
        heatmap_pred = heatmaps_pred[i].squeeze()
        heatmap_gt = heatmaps_gt[i].squeeze()
        if use_tw:
            loss += 0.5 * criterion(
                heatmap_pred * target_weight[:, i],
                heatmap_gt * target_weight[:, i])
        else:
            loss += 0.5 * criterion(heatmap_pred, heatmap_gt)
    return float(loss / num_joints)


@pytest.mark.parametrize("seed", [0, 1])
def test_joints_mse_matches_torch(seed):
    rng = np.random.RandomState(seed)
    out = rng.randn(4, 21, 48, 48).astype(np.float32)
    tgt = rng.rand(4, 21, 48, 48).astype(np.float32)
    tw = (rng.rand(4, 21, 1) > 0.3).astype(np.float32)
    ref = _torch_joints_mse(out, tgt, tw)
    got = float(joints_mse_loss(jnp.asarray(out), jnp.asarray(tgt),
                                jnp.asarray(tw)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_joints_mse_no_weight():
    rng = np.random.RandomState(2)
    out = rng.randn(2, 5, 8, 8).astype(np.float32)
    tgt = rng.rand(2, 5, 8, 8).astype(np.float32)
    ref = _torch_joints_mse(out, tgt, np.ones((2, 5, 1), np.float32),
                            use_tw=False)
    got = float(joints_mse_loss(jnp.asarray(out), jnp.asarray(tgt), None))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_classification_loss_matches_torch():
    import torch.nn as nn

    rng = np.random.RandomState(0)
    logits = rng.randn(16, 19).astype(np.float32)
    labels = rng.randint(0, 19, (16,))
    ref = float(nn.CrossEntropyLoss(reduction="mean")(
        torch.as_tensor(logits), torch.as_tensor(labels)))
    got = float(classification_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_multitask_loss_weighting():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 19).astype(np.float32))
    hm = jnp.asarray(rng.randn(4, 21, 48, 48).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 19, (4,)))
    tgt = jnp.asarray(rng.rand(4, 21, 48, 48).astype(np.float32))
    tw = jnp.ones((4, 21))
    total, parts = multitask_loss(logits, hm, labels, tgt, tw)
    np.testing.assert_allclose(
        float(total),
        float(parts["class_loss"]) + float(parts["joints_loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        float(parts["class_loss"]),
        float(classification_loss(logits, labels)) * 0.001, rtol=1e-6)


# ---- PCK ----

def _ref_pose_accuracy(output, target):
    """Numpy port of reference libs/metrics.py:6-62."""
    from tests.test_heatmap import _ref_get_max_preds

    num_joints = output.shape[1]
    pred, _ = _ref_get_max_preds(output)
    tgt, _ = _ref_get_max_preds(target)
    h, w = output.shape[2], output.shape[3]
    norm = np.ones((pred.shape[0], 2)) * np.array([h, w]) / 10

    dists = np.zeros((pred.shape[1], pred.shape[0]))
    for n in range(pred.shape[0]):
        for c in range(pred.shape[1]):
            if tgt[n, c, 0] > 1 and tgt[n, c, 1] > 1:
                dists[c, n] = np.linalg.norm(
                    pred[n, c, :] / norm[n] - tgt[n, c, :] / norm[n])
            else:
                dists[c, n] = -1

    def dist_acc(d, thr=0.5):
        cal = np.not_equal(d, -1)
        n = cal.sum()
        return np.less(d[cal], thr).sum() * 1.0 / n if n > 0 else -1

    acc = np.zeros(num_joints + 1)
    avg_acc, cnt = 0, 0
    for i in range(num_joints):
        acc[i + 1] = dist_acc(dists[i])
        if acc[i + 1] >= 0:
            avg_acc += acc[i + 1]
            cnt += 1
    avg_acc = avg_acc / cnt if cnt != 0 else 0
    if cnt != 0:
        acc[0] = avg_acc
    return acc, avg_acc, cnt, pred


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_pck_matches_reference(seed):
    rng = np.random.RandomState(seed)
    out = rng.rand(8, 21, 48, 48).astype(np.float32)
    tgt = rng.rand(8, 21, 48, 48).astype(np.float32)
    # Some joints invalid: make GT peak at (0,0)
    tgt[:, 3] = 0.0
    tgt[:, 3, 0, 0] = 1.0
    ref_acc, ref_avg, ref_cnt, ref_pred = _ref_pose_accuracy(out, tgt)
    acc, avg, cnt, pred = pck_accuracy(jnp.asarray(out), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(acc), ref_acc, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(avg), ref_avg, rtol=1e-5)
    assert int(cnt) == ref_cnt
    np.testing.assert_allclose(np.asarray(pred), ref_pred)


# ---- F1 ----

def test_macro_f1_matches_sklearn():
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    rng = np.random.RandomState(0)
    y_true = rng.randint(0, 19, (500,))
    y_pred = rng.randint(0, 19, (500,))
    ref = sklearn_metrics.f1_score(y_true, y_pred, average="macro")
    got = float(batch_macro_f1(jnp.asarray(y_true), jnp.asarray(y_pred), 19))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_confusion_streaming():
    rng = np.random.RandomState(1)
    conf = jnp.zeros((19, 19))
    all_t, all_p = [], []
    for _ in range(5):
        t = rng.randint(0, 19, (64,))
        p = rng.randint(0, 19, (64,))
        conf = confusion_update(conf, jnp.asarray(t), jnp.asarray(p))
        all_t.append(t)
        all_p.append(p)
    sklearn_metrics = pytest.importorskip("sklearn.metrics")
    ref = sklearn_metrics.f1_score(
        np.concatenate(all_t), np.concatenate(all_p), average="macro")
    np.testing.assert_allclose(float(macro_f1_from_confusion(conf)), ref,
                               rtol=1e-6)
