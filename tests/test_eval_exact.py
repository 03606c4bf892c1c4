"""Exact full-split evaluation (VERDICT r1 #3): with drop_last=False
loaders and the per-sample 'valid' mask, epoch metrics cover every
sample exactly once — matching the reference's full-set eval
(reference train.py:239-240, libs/load.py:289-305 drop_last=False).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import jax

from hgr_tpu.config import DEFAULT_NAMES
from hgr_tpu.data.dataset import read_annotations
from hgr_tpu.data.loader import BatchLoader
from hgr_tpu.data.synthetic import write_synthetic_split
from hgr_tpu.models import MultiTaskNet
from hgr_tpu.train.loop import EpochMetrics, eval_epoch
from hgr_tpu.train.state import create_train_state
from hgr_tpu.train.steps import make_eval_step

IMAGE = 64
HI = jax.lax.Precision.HIGHEST
N_SAMPLES = 11  # deliberately NOT a multiple of any batch size used


@pytest.fixture(scope="module")
def split_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("data"))
    write_synthetic_split(d, "val", N_SAMPLES, image_size=96, seed=5)
    return d


def _eval(split_dir, batch_size):
    idx = read_annotations(
        os.path.join(split_dir, "annotations", "val"), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=batch_size, canvas_size=128,
                         shuffle=False, drop_last=False, num_workers=1)
    model = MultiTaskNet(image_size=(IMAGE, IMAGE), precision=HI)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(100,))
    step = make_eval_step(image_size=(IMAGE, IMAGE),
                          heatmap_size=(IMAGE // 4, IMAGE // 4))
    metrics = EpochMetrics(19)
    out = eval_epoch(state, step, loader, metrics)
    return out, metrics


def test_confusion_total_equals_dataset_size(split_dir):
    out, metrics = _eval(split_dir, batch_size=4)  # 11 = 4 + 4 + 3
    assert float(np.asarray(metrics.conf).sum()) == N_SAMPLES
    assert out["samples"] == N_SAMPLES


def test_metrics_independent_of_batch_size(split_dir):
    """Padded tail batches must not perturb any epoch metric: bs=4
    (padded tail) == bs=1 (never padded) == bs=11 (single full batch)."""
    out4, m4 = _eval(split_dir, batch_size=4)
    out1, m1 = _eval(split_dir, batch_size=1)
    out11, m11 = _eval(split_dir, batch_size=11)

    np.testing.assert_array_equal(np.asarray(m4.conf), np.asarray(m1.conf))
    np.testing.assert_array_equal(np.asarray(m4.conf), np.asarray(m11.conf))
    for k in ("total_loss", "class_loss", "joints_loss", "epoch_f1"):
        np.testing.assert_allclose(out4[k], out1[k], rtol=1e-4, err_msg=k)
        np.testing.assert_allclose(out4[k], out11[k], rtol=1e-4, err_msg=k)
