"""Golden tests: Gaussian target rendering + argmax decode vs numpy
re-derivations of the reference (libs/load.py:148-206, libs/utils.py:4-32).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hgr_tpu.ops.heatmap import generate_targets, get_max_preds


def _ref_generate_target(joints, joints_vis, image_size, heatmap_size, sigma,
                         num_joints):
    """Numpy port of the reference per-joint loop (libs/load.py:148-206)."""
    target = np.zeros((num_joints, heatmap_size[1], heatmap_size[0]),
                      dtype=np.float32)
    if joints.shape[0] == 0:
        return target, np.zeros((num_joints, 1), dtype=np.float32)
    target_weight = np.ones((num_joints, 1), dtype=np.float32)
    target_weight[:, 0] = joints_vis[:, 0]
    tmp_size = sigma * 3
    for joint_id in range(num_joints):
        feat_stride = [i / h for (i, h) in zip(image_size, heatmap_size)]
        mu_x = int(joints[joint_id][0] / feat_stride[0] + 0.5)
        mu_y = int(joints[joint_id][1] / feat_stride[1] + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= heatmap_size[0] or ul[1] >= heatmap_size[1] \
                or br[0] < 0 or br[1] < 0:
            target_weight[joint_id] = 0
            continue
        size = 2 * tmp_size + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
        g_x = max(0, -ul[0]), min(br[0], heatmap_size[0]) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], heatmap_size[1]) - ul[1]
        img_x = max(0, ul[0]), min(br[0], heatmap_size[0])
        img_y = max(0, ul[1]), min(br[1], heatmap_size[1])
        if target_weight[joint_id] > 0.5:
            target[joint_id][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
                g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return target, target_weight


def _ref_get_max_preds(batch_heatmaps):
    """Numpy port of reference libs/utils.py:4-32."""
    batch_size, num_joints = batch_heatmaps.shape[:2]
    width = batch_heatmaps.shape[3]
    heatmaps_reshaped = batch_heatmaps.reshape((batch_size, num_joints, -1))
    idx = np.argmax(heatmaps_reshaped, 2)
    maxvals = np.amax(heatmaps_reshaped, 2)
    maxvals = maxvals.reshape((batch_size, num_joints, 1))
    idx = idx.reshape((batch_size, num_joints, 1))
    preds = np.tile(idx, (1, 1, 2)).astype(np.float32)
    preds[:, :, 0] = (preds[:, :, 0]) % width
    preds[:, :, 1] = np.floor((preds[:, :, 1]) / width)
    pred_mask = np.tile(np.greater(maxvals, 0.0), (1, 1, 2)).astype(np.float32)
    preds *= pred_mask
    return preds, maxvals


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_generate_targets_matches_reference(seed):
    rng = np.random.RandomState(seed)
    j = 21
    # Mix of in-bounds, near-edge, and far out-of-bounds joints.
    joints = rng.rand(j, 2).astype(np.float64) * 300 - 50
    vis = np.ones((j, 1))
    ref_t, ref_w = _ref_generate_target(
        joints, vis, [192, 192], [48, 48], 2, j)
    got_t, got_w = generate_targets(
        jnp.asarray(joints), jnp.ones((j,)), (192, 192), (48, 48), 2.0)
    np.testing.assert_allclose(np.asarray(got_t), ref_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), ref_w[:, 0], atol=0)


def test_generate_targets_invisible_joint():
    joints = np.array([[96.0, 96.0], [50.0, 50.0]])
    vis = jnp.array([1.0, 0.0])
    t, w = generate_targets(jnp.asarray(joints), vis, (192, 192), (48, 48), 2.0)
    assert np.asarray(w).tolist() == [1.0, 0.0]
    assert float(jnp.max(t[1])) == 0.0
    assert float(jnp.max(t[0])) == 1.0  # unnormalized peak == 1


def test_generate_targets_batched():
    rng = np.random.RandomState(3)
    joints = rng.rand(4, 21, 2) * 250 - 20
    got_t, got_w = generate_targets(
        jnp.asarray(joints), jnp.ones((4, 21)), (192, 192), (48, 48), 2.0)
    assert got_t.shape == (4, 21, 48, 48)
    for b in range(4):
        ref_t, ref_w = _ref_generate_target(
            joints[b], np.ones((21, 1)), [192, 192], [48, 48], 2, 21)
        np.testing.assert_allclose(np.asarray(got_t[b]), ref_t, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_w[b]), ref_w[:, 0])


@pytest.mark.parametrize("seed", [0, 5])
def test_get_max_preds_matches_reference(seed):
    rng = np.random.RandomState(seed)
    hm = rng.randn(8, 21, 48, 48).astype(np.float32)
    hm[0, 0] = -1.0  # all-negative map -> masked to 0
    ref_p, ref_v = _ref_get_max_preds(hm)
    got_p, got_v = get_max_preds(jnp.asarray(hm))
    np.testing.assert_allclose(np.asarray(got_p), ref_p)
    np.testing.assert_allclose(np.asarray(got_v), ref_v)
