"""DeviceCacheLoader must be a bit-identical stand-in for BatchLoader:
same shuffle order, same tail padding, same valid masks, same canvases —
only the transport changes (HBM-resident gather instead of per-epoch
host staging). See hgr_tpu/data/device_cache.py."""

import os
import tempfile

import numpy as np
import pytest

from hgr_tpu.config import DEFAULT_NAMES
from hgr_tpu.data.dataset import read_annotations
from hgr_tpu.data.device_cache import DeviceCacheLoader
from hgr_tpu.data.loader import BatchLoader
from hgr_tpu.data.synthetic import write_synthetic_split

KW = dict(batch_size=4, canvas_size=96, shuffle=True, seed=5,
          drop_last=False, num_workers=1)


@pytest.fixture(scope="module")
def split_dir():
    with tempfile.TemporaryDirectory() as d:
        # 10 samples -> 3 batches of 4 with a 2-sample padded tail
        write_synthetic_split(d, "train", 10, image_size=64, seed=0)
        yield os.path.join(d, "annotations", "train")


def _epoch(loader):
    return [{k: np.asarray(v) for k, v in b.items()} for b in loader]


def test_cached_batches_match_streaming_two_epochs(split_dir):
    idx = read_annotations(split_dir, DEFAULT_NAMES)
    stream = BatchLoader(idx, **KW)
    cached = DeviceCacheLoader(idx, **KW)
    for epoch in range(2):  # epoch 2 reshuffles; orders must track
        bs, bc = _epoch(stream), _epoch(cached)
        assert len(bs) == len(bc) == len(stream)
        for b_s, b_c in zip(bs, bc):
            assert set(b_s) == set(b_c)
            for k in b_s:
                np.testing.assert_array_equal(
                    b_s[k], b_c[k], err_msg=f"epoch {epoch} key {k}")


def test_tail_mask_and_padding(split_dir):
    idx = read_annotations(split_dir, DEFAULT_NAMES)
    cached = DeviceCacheLoader(idx, **{**KW, "shuffle": False})
    batches = _epoch(cached)
    assert len(batches) == 3
    tail = batches[-1]
    np.testing.assert_array_equal(tail["valid"], [1.0, 1.0, 0.0, 0.0])
    # padding repeats the tail ids (np.resize semantics)
    np.testing.assert_array_equal(tail["label"][2:], tail["label"][:2])


def test_cache_built_once(split_dir):
    idx = read_annotations(split_dir, DEFAULT_NAMES)
    cached = DeviceCacheLoader(idx, **KW)
    _epoch(cached)
    cache_ref = cached._cache
    _epoch(cached)
    assert cached._cache is cache_ref  # second epoch reused, not rebuilt
