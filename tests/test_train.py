"""End-to-end training tests on the synthetic fixture: the loader reads
the reference annotation format, the jitted step runs, the loss goes down
(overfit), checkpoints save/restore, and the LR schedule steps.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.config import AugmentConfig, DataConfig, DEFAULT_NAMES, ModelConfig, TrainConfig
from hgr_tpu.data.dataset import read_annotations
from hgr_tpu.data.loader import BatchLoader
from hgr_tpu.data.synthetic import write_synthetic_split
from hgr_tpu.models import MultiTaskNet
from hgr_tpu.train.checkpoint import CheckpointManager
from hgr_tpu.train.loop import EpochMetrics, eval_epoch, train_epoch
from hgr_tpu.train.state import create_train_state, multistep_lr
from hgr_tpu.train.steps import make_eval_step, make_train_step

IMAGE = 64
HM = IMAGE // 4
HI = jax.lax.Precision.HIGHEST


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hagrid_synth"))
    write_synthetic_split(d, "train", 24, image_size=96, seed=0)
    write_synthetic_split(d, "val", 8, image_size=96, seed=1)
    return d


def test_reader_parses_reference_format(synth_dir):
    idx = read_annotations(
        os.path.join(synth_dir, "annotations", "train"), DEFAULT_NAMES)
    assert len(idx) == 24
    s = idx.samples[0]
    assert os.path.isfile(s.image_path)
    assert s.label in DEFAULT_NAMES
    labels = idx.labels()
    assert labels.min() >= 0 and labels.max() < 19
    # the fixture interleaves one empty-landmark sample
    empties = [s for s in idx.samples if len(s.landmark) == 0]
    assert len(empties) == 1


def test_reader_raises_on_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        read_annotations(str(tmp_path), DEFAULT_NAMES)


def test_loader_batches(synth_dir):
    idx = read_annotations(
        os.path.join(synth_dir, "annotations", "train"), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=8, canvas_size=128, shuffle=True,
                         num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["canvas"].shape == (8, 128, 128, 3)
    assert b["canvas"].dtype == np.uint8
    assert b["joints"].shape == (8, 21, 2)
    assert b["label"].shape == (8,)
    # shuffling changes order between epochs
    b2 = next(iter(loader))
    assert not np.array_equal(b["label"], b2["label"]) or not np.array_equal(
        b["canvas"], b2["canvas"])


def test_loader_eval_padding(synth_dir):
    idx = read_annotations(
        os.path.join(synth_dir, "annotations", "val"), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=5, canvas_size=128, shuffle=False,
                         drop_last=False, num_workers=1)
    batches = list(loader)
    assert len(batches) == 2
    # 8 = 5 + 3: tail batch carries a per-sample mask (3 real, 2 padded)
    np.testing.assert_array_equal(
        batches[-1]["valid"], np.array([1, 1, 1, 0, 0], np.float32))
    assert int(batches[-1]["valid"].sum()) == 3


def test_overfit_synthetic(synth_dir):
    """Loss decreases markedly when overfitting a few synthetic batches."""
    idx = read_annotations(
        os.path.join(synth_dir, "annotations", "train"), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=8, canvas_size=128, shuffle=False,
                         num_workers=2)
    batch = next(iter(loader))
    batch.pop("valid")
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    model = MultiTaskNet(image_size=(IMAGE, IMAGE), precision=HI)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, IMAGE, IMAGE, 3), lr=3e-3,
        milestones_steps=(10_000,))
    # no stochastic augmentation -> pure overfit signal
    aug_off = AugmentConfig(rotate_factor=0, scale_factor=0,
                            translate_factor=0, horizontal_flip=False,
                            color_jittering=False)
    step = make_train_step(aug_off, image_size=(IMAGE, IMAGE),
                           heatmap_size=(HM, HM))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, m = step(state, jb, sub)
        losses.append(float(m["total_loss"]))
    assert losses[-1] < losses[0] * 0.5, losses
    assert np.isfinite(losses).all()


def test_checkpoint_roundtrip(tmp_path, synth_dir):
    model = MultiTaskNet(image_size=(IMAGE, IMAGE), precision=HI)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(100,))
    ckpt = CheckpointManager(str(tmp_path / "weights"))
    ckpt.save_last(state)
    assert ckpt.has("last")

    # best saves only on improvement
    assert ckpt.maybe_save_best(state, 1.0)
    assert not ckpt.maybe_save_best(state, 2.0)
    assert ckpt.maybe_save_best(state, 0.5)

    # mutate then restore
    zeroed = state.replace(
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params))
    restored = ckpt.restore(zeroed, "last")
    orig = jax.tree_util.tree_leaves(state.params)
    back = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_multistep_lr_schedule():
    sched = multistep_lr(1e-3, milestones_steps=(10, 20), factor=0.1)
    np.testing.assert_allclose(float(sched(0)), 1e-3)
    np.testing.assert_allclose(float(sched(9)), 1e-3)
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(25)), 1e-5, rtol=1e-6)


def test_eval_epoch_metrics(synth_dir):
    idx = read_annotations(
        os.path.join(synth_dir, "annotations", "val"), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=4, canvas_size=128, shuffle=False,
                         num_workers=1)
    model = MultiTaskNet(image_size=(IMAGE, IMAGE), precision=HI)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(100,))
    eval_step = make_eval_step(image_size=(IMAGE, IMAGE),
                               heatmap_size=(HM, HM))
    metrics = EpochMetrics(19)
    out = eval_epoch(state, eval_step, loader, metrics)
    assert set(out) >= {"total_loss", "class_loss", "joints_loss",
                        "pose_acc", "epoch_f1"}
    assert np.isfinite(out["total_loss"])
    assert 0.0 <= out["epoch_f1"] <= 1.0


def test_profile_steps_writes_trace(tmp_path, synth_dir):
    """profile_steps captures a jax.profiler trace over the first N
    train steps (SURVEY.md §5.1); the trace dir must be non-empty."""
    import glob as _glob

    idx = read_annotations(
        os.path.join(synth_dir, "annotations", "train"), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=8, canvas_size=128,
                         shuffle=False, num_workers=1)
    model = MultiTaskNet(image_size=(IMAGE, IMAGE))
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(10_000,))
    step = make_train_step(AugmentConfig(), image_size=(IMAGE, IMAGE),
                           heatmap_size=(HM, HM))
    prof_dir = str(tmp_path / "profile")
    train_epoch(state, step, loader, jax.random.PRNGKey(0),
                EpochMetrics(19), profile_steps=2, profile_dir=prof_dir)
    found = _glob.glob(os.path.join(prof_dir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in found), found


def test_eval_epoch_measures_loader_wait(synth_dir):
    """eval_epoch must instrument loader blocking like train_epoch does
    (val/test loader_wait_s was emitted as an unmeasured 0.0 before)."""
    idx = read_annotations(
        os.path.join(synth_dir, "annotations", "val"), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=4, canvas_size=128,
                         shuffle=False, drop_last=False, num_workers=1)
    model = MultiTaskNet(image_size=(IMAGE, IMAGE))
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, IMAGE, IMAGE, 3), lr=1e-3,
        milestones_steps=(10_000,))
    ev = make_eval_step(image_size=(IMAGE, IMAGE), heatmap_size=(HM, HM))
    metrics = EpochMetrics(19)
    snap = eval_epoch(state, ev, loader, metrics)
    assert "loader_wait_s" in snap
    assert snap["loader_wait_s"] > 0.0  # real host time was accumulated


def test_loader_abandoned_iterator_reclaims_producer(synth_dir):
    """Abandoning a loader iterator (e.g. next(iter(loader)) for a
    single debug batch) must stop the producer thread instead of leaving
    it blocked on the bounded queue holding staged batches."""
    import gc
    import threading
    import time as _time

    idx = read_annotations(
        os.path.join(synth_dir, "annotations", "train"), DEFAULT_NAMES)
    loader = BatchLoader(idx, batch_size=2, canvas_size=128, shuffle=False,
                         num_workers=1, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # what GC does to an abandoned generator
    del it
    gc.collect()
    deadline = _time.time() + 10
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= before


def test_grad_accum_exact_combination():
    """grad_accum=2 with two IDENTICAL microbatches and zeroed augment
    randomness reproduces the grad_accum=1 update exactly: duplicated
    samples make the full-batch BN statistics equal the per-microbatch
    ones, and the valid-count-weighted gradient recombination
    (train/steps.py make_train_step) is the full masked mean."""
    img = 64
    b = 8  # rows 0-3 == rows 4-7
    aug = AugmentConfig(rotate_factor=0.0, scale_factor=0.0,
                        translate_factor=0.0, horizontal_flip=False,
                        color_jittering=False)
    model = MultiTaskNet(image_size=(img, img))
    rng = np.random.RandomState(0)
    half = {
        "canvas": rng.randint(0, 255, (b // 2, img, img, 3)).astype(np.uint8),
        "orig_to_canvas": np.tile(
            np.asarray([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
            (b // 2, 1, 1)),
        "sizes_hw": np.full((b // 2, 2), float(img), np.float32),
        "joints": (rng.rand(b // 2, 21, 2) * img).astype(np.float32),
        "joints_vis": np.ones((b // 2, 21), np.float32),
        "label": rng.randint(0, 19, (b // 2,)).astype(np.int32),
        "valid": np.ones((b // 2,), np.float32),
    }
    batch = {k: jnp.asarray(np.concatenate([v, v], axis=0))
             for k, v in half.items()}

    def run(accum):
        state, _ = create_train_state(
            model, jax.random.PRNGKey(0), (1, img, img, 3), lr=1e-3,
            milestones_steps=(10**6,))
        step = make_train_step(aug, image_size=(img, img),
                               heatmap_size=(img // 4, img // 4),
                               donate=False, grad_accum=accum,
                               debug_return_grads=True)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(7))
        return new_state, metrics

    s1, m1 = run(1)
    s2, m2 = run(2)
    for name in ("total_loss", "class_loss", "joints_loss", "cls_f1score",
                 "pose_acc", "valid_cnt"):
        np.testing.assert_allclose(np.asarray(m1[name], np.float32),
                                   np.asarray(m2[name], np.float32),
                                   rtol=2e-5, atol=2e-6, err_msg=name)
    # pose_cnt keeps PER-MICROBATCH accumulator granularity (each
    # microbatch contributes its own (acc, cnt) pair, the reference's
    # per-batch accumulation, train.py:89-90) — with two identical
    # microbatches that is exactly twice the single-batch count.
    assert float(m2["pose_cnt"]) == 2 * float(m1["pose_cnt"])
    np.testing.assert_allclose(np.asarray(m1["conf_update"]),
                               np.asarray(m2["conf_update"]))
    # Compare PRE-optimizer gradients: AdamW's first step normalizes to
    # ~±lr·sign(g), so float noise in near-zero grads would flip the
    # post-update params by 2·lr regardless of recombination correctness.
    def rel_diff(a_, b_):
        return float(jnp.max(jnp.abs(a_ - b_))
                     / (jnp.max(jnp.abs(a_)) + 1e-12))

    diffs = jax.tree_util.tree_map(rel_diff, m1["_grads"], m2["_grads"])
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-4


def test_checkpoint_async_snapshot_semantics(tmp_path):
    """Async saves snapshot the state EAGERLY: mutating (or donating)
    the live state right after save_last must not change what restore
    returns — and a best_metric.txt without a committed best/ dir is
    ignored on init (interrupted async save)."""
    img = 32
    model = MultiTaskNet(image_size=(img, img))
    state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                  (1, img, img, 3), lr=1e-3,
                                  milestones_steps=(10,))
    ckpt = CheckpointManager(str(tmp_path / "w"))
    saved_leaf = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    ckpt.save_last(state)
    # simulate the next train step reusing/donating the buffers
    mutated = state.replace(params=jax.tree_util.tree_map(
        lambda p: p + 1.0, state.params))
    restored = ckpt.restore(mutated, "last")
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        saved_leaf)

    # interrupted-async guard: metric file without best/ dir is ignored
    d = tmp_path / "w2"
    d.mkdir()
    (d / "best_metric.txt").write_text("0.0")
    c2 = CheckpointManager(str(d))
    assert c2.maybe_save_best(state, 123.0), (
        "stale best_metric.txt (no committed best/) must not block saves")


def test_grad_accum_tail_batch_weighting():
    """With UNEQUAL valid counts across microbatches (padded tail), the
    accumulated gradient equals the valid-count-weighted average of the
    per-microbatch gradients, with BN statistics threaded sequentially
    (exactly what the accum scan does)."""
    img = 64
    aug = AugmentConfig(rotate_factor=0.0, scale_factor=0.0,
                        translate_factor=0.0, horizontal_flip=False,
                        color_jittering=False)
    model = MultiTaskNet(image_size=(img, img))
    rng = np.random.RandomState(1)

    def mk(b, valid):
        return {
            "canvas": jnp.asarray(rng.randint(0, 255, (b, img, img, 3)),
                                  jnp.uint8),
            "orig_to_canvas": jnp.tile(jnp.asarray(
                [[1.0, 0, 0], [0, 1.0, 0]], jnp.float32), (b, 1, 1)),
            "sizes_hw": jnp.full((b, 2), float(img)),
            "joints": jnp.asarray(rng.rand(b, 21, 2) * img, jnp.float32),
            "joints_vis": jnp.ones((b, 21)),
            "label": jnp.asarray(rng.randint(0, 19, (b,)), jnp.int32),
            "valid": jnp.asarray(valid, jnp.float32),
        }

    mb1 = mk(4, [1, 1, 1, 1])
    mb2 = mk(4, [1, 1, 0, 0])
    full = {k: jnp.concatenate([mb1[k], mb2[k]], axis=0) for k in mb1}

    state0, _ = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, img, img, 3), lr=1e-3,
                                   milestones_steps=(10**6,))
    kw = dict(image_size=(img, img), heatmap_size=(img // 4, img // 4),
              donate=False, debug_return_grads=True)
    step1 = make_train_step(aug, grad_accum=1, **kw)
    step2 = make_train_step(aug, grad_accum=2, **kw)

    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key, 2)
    s_after1, m1 = step1(state0, mb1, k1)
    # microbatch 2 sees params0 but the BN stats mb1 produced (the scan
    # threads stats through the carry)
    s_mid = state0.replace(batch_stats=s_after1.batch_stats)
    _, m2 = step1(s_mid, mb2, k2)

    _, macc = step2(state0, full, key)

    v1, v2 = float(m1["valid_cnt"]), float(m2["valid_cnt"])
    assert (v1, v2) == (4.0, 2.0)
    expected = jax.tree_util.tree_map(
        lambda a, b: (a * v1 + b * v2) / (v1 + v2),
        m1["_grads"], m2["_grads"])
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))
                           / (jnp.max(jnp.abs(a)) + 1e-12)),
        expected, macc["_grads"])
    assert max(jax.tree_util.tree_leaves(rel)) < 2e-4
    np.testing.assert_allclose(
        float(macc["total_loss"]),
        (float(m1["total_loss"]) * v1 + float(m2["total_loss"]) * v2)
        / (v1 + v2), rtol=1e-5)
