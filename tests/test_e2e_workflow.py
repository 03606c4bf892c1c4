"""Capstone integration test: the full reference user workflow chained —
synthetic dataset -> train -> checkpoint -> export -> exported-graph eval
-> fused detect pipeline on a frame. Tiny sizes; CPU."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.config import AugmentConfig, DEFAULT_NAMES
from hgr_tpu.data.dataset import read_annotations
from hgr_tpu.data.loader import BatchLoader
from hgr_tpu.data.synthetic import write_synthetic_split
from hgr_tpu.models import MultiTaskNet
from hgr_tpu.train.checkpoint import CheckpointManager
from hgr_tpu.train.state import create_train_state
from hgr_tpu.train.steps import make_eval_step, make_train_step

IMAGE = 64
HI = jax.lax.Precision.HIGHEST


def test_full_workflow(tmp_path):
    # 1. dataset in the reference format
    root = str(tmp_path / "data")
    write_synthetic_split(root, "train", 8, image_size=96, seed=0)
    idx = read_annotations(os.path.join(root, "annotations", "train"),
                           DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=4, canvas_size=128, shuffle=True,
                         num_workers=2)

    # 2. a couple of train steps + checkpoint
    model = MultiTaskNet(image_size=(IMAGE, IMAGE), precision=HI)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(100,))
    step = make_train_step(AugmentConfig(), image_size=(IMAGE, IMAGE),
                           heatmap_size=(IMAGE // 4, IMAGE // 4))
    key = jax.random.PRNGKey(1)
    for batch in loader:
        batch.pop("valid")
        key, sub = jax.random.split(key)
        state, metrics = step(
            state, {k: jnp.asarray(v) for k, v in batch.items()}, sub)
    assert np.isfinite(float(metrics["total_loss"]))
    ckpt = CheckpointManager(str(tmp_path / "w"))
    ckpt.save_last(state)

    # 3. restore -> export -> run the EXPORTED artifact
    restored = ckpt.restore(state, "last")
    from hgr_tpu.infer.export import (
        eval_exported,
        export_stablehlo,
        load_stablehlo,
    )

    variables = {"params": restored.params,
                 "batch_stats": restored.batch_stats}
    art = str(tmp_path / "m.stablehlo")
    export_stablehlo(model, variables, art, batch=4)
    fn = load_stablehlo(art)
    eval_loader = BatchLoader(idx, batch_size=4, canvas_size=128,
                              shuffle=False, drop_last=False, num_workers=1)
    res = eval_exported(fn, eval_loader, num_classes=19,
                        image_size=(IMAGE, IMAGE))
    assert res["images"] == 8
    assert 0.0 <= res["test_f1"] <= 1.0

    # 4. trained weights drive the fused detect pipeline on a raw frame
    from hgr_tpu.infer.detect import HandGesturePipeline
    from hgr_tpu.infer.weights import load_detector_weights

    pipe = HandGesturePipeline(
        variables, load_detector_weights("", det_img_size=160),
        DEFAULT_NAMES, det_img_size=160, cls_img_size=(IMAGE, IMAGE),
        score_thresh=-1.0, dtype=jnp.float32)
    frame = np.random.RandomState(0).randint(
        0, 255, (180, 320, 3), np.uint8)
    result = pipe.infer_frame(frame)
    assert result is not None and result["landmarks"].shape == (21, 2)


def test_parallel_eval_step_matches_single():
    from hgr_tpu.parallel.mesh import make_mesh, shard_batch
    from hgr_tpu.parallel.steps import make_parallel_eval_step, shard_state

    rng = np.random.RandomState(0)
    B, S = 8, 96
    host = {
        "canvas": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
        "orig_to_canvas": np.tile(
            np.asarray([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (B, 1, 1)),
        "sizes_hw": np.full((B, 2), float(S), np.float32),
        "joints": (rng.rand(B, 21, 2) * S).astype(np.float32),
        "joints_vis": np.ones((B, 21), np.float32),
        "label": rng.randint(0, 19, (B,)).astype(np.int32),
    }
    model = MultiTaskNet(image_size=(IMAGE, IMAGE), precision=HI)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(100,))
    ev = make_eval_step(image_size=(IMAGE, IMAGE),
                        heatmap_size=(IMAGE // 4, IMAGE // 4))
    m1 = ev(state, {k: jnp.asarray(v) for k, v in host.items()})

    mesh = make_mesh({"data": 8})
    sstate = shard_state(state, mesh)
    pev = make_parallel_eval_step(
        mesh, sstate, image_size=(IMAGE, IMAGE),
        heatmap_size=(IMAGE // 4, IMAGE // 4))
    with mesh:
        m2 = pev(sstate, shard_batch(host, mesh))
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m2["total_loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(m1["pose_acc"]),
                               float(m2["pose_acc"]), rtol=1e-4)
