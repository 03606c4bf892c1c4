"""Determinism / reproducibility (the reference relies on
seed_everything(42) + deterministic=True, train.py:21,233; here the jax
PRNG makes it structural — these tests pin it)."""

import numpy as np

import jax
import jax.numpy as jnp

from hgr_tpu.config import AugmentConfig
from hgr_tpu.data.pipeline import draw_augment_params
from hgr_tpu.models import MultiTaskNet
from hgr_tpu.train.state import create_train_state
from hgr_tpu.train.steps import make_train_step

IMAGE = 64


def _batch(b=4, canvas=96, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "canvas": jnp.asarray(rng.randint(0, 255, (b, canvas, canvas, 3)),
                              jnp.uint8),
        "orig_to_canvas": jnp.tile(
            jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (b, 1, 1)),
        "sizes_hw": jnp.full((b, 2), float(canvas)),
        "joints": jnp.asarray(rng.rand(b, 21, 2) * canvas, jnp.float32),
        "joints_vis": jnp.ones((b, 21)),
        "label": jnp.asarray(rng.randint(0, 19, (b,)), jnp.int32),
    }


def test_train_step_deterministic():
    def run():
        model = MultiTaskNet(image_size=(IMAGE, IMAGE))
        state, _ = create_train_state(
            model, jax.random.PRNGKey(42), (1, IMAGE, IMAGE, 3), lr=1e-3,
            milestones_steps=(100,))
        step = make_train_step(AugmentConfig(), image_size=(IMAGE, IMAGE),
                               heatmap_size=(IMAGE // 4, IMAGE // 4),
                               donate=False)
        _, m = step(state, _batch(), jax.random.PRNGKey(7))
        return float(m["total_loss"]), float(m["pose_acc"])

    a = run()
    b = run()
    assert a == b, (a, b)


def test_augment_params_keyed():
    cfg = AugmentConfig()
    sizes = jnp.full((16, 2), 96.0)
    p1 = draw_augment_params(jax.random.PRNGKey(3), 16, sizes, cfg)
    p2 = draw_augment_params(jax.random.PRNGKey(3), 16, sizes, cfg)
    p3 = draw_augment_params(jax.random.PRNGKey(4), 16, sizes, cfg)
    np.testing.assert_array_equal(np.asarray(p1.scale), np.asarray(p2.scale))
    np.testing.assert_array_equal(np.asarray(p1.rot), np.asarray(p2.rot))
    assert not np.array_equal(np.asarray(p1.scale), np.asarray(p3.scale))


def test_loader_epoch_seeding():
    """Same seed -> same first-epoch order; different epochs differ."""
    import os

    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.data.dataset import read_annotations
    from hgr_tpu.data.loader import BatchLoader
    from hgr_tpu.data.synthetic import write_synthetic_split
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        write_synthetic_split(d, "train", 20, image_size=64, seed=0)
        idx = read_annotations(os.path.join(d, "annotations", "train"),
                               DEFAULT_NAMES)
        l1 = BatchLoader(idx, batch_size=4, canvas_size=96, shuffle=True,
                         seed=5, num_workers=1)
        l2 = BatchLoader(idx, batch_size=4, canvas_size=96, shuffle=True,
                         seed=5, num_workers=1)
        b1 = next(iter(l1))
        b2 = next(iter(l2))
        np.testing.assert_array_equal(b1["label"], b2["label"])
        b1b = next(iter(l1))  # epoch 2 reshuffles
        assert not np.array_equal(b1["label"], b1b["label"]) or \
            not np.array_equal(b1["canvas"], b1b["canvas"])
