"""HBM-resident dataset cache: stage each sample ONCE, then serve every
epoch by on-device gather.

On hosts where the accelerator link is the bottleneck (this sandbox's
tunneled TPU moves ~15-25 MB/s; even PCIe hosts pay ~100 us/batch), the
streaming loader re-uploads the identical canvases every epoch — the
staging pass is deterministic per sample (pipeline.stage_image has no
randomness; augmentation randomness lives on device in the train step),
so all the per-epoch loader does is reorder bytes the device has already
seen.  ``DeviceCacheLoader`` exploits that: the first pass streams the
split through the normal host loader (native C++ decode + staging pool)
into preallocated device buffers, and every subsequent batch is a pure
on-device ``jnp.take`` — zero host->device bytes per epoch.

Epoch semantics are BIT-IDENTICAL to ``BatchLoader``: the shuffle order,
tail padding (sample repetition) and ``valid`` masks come from the same
``_batch_ids()`` stream with the same seed, so a cached run and a
streaming run see exactly the same batch compositions
(tests/test_device_cache.py asserts this).

Sizing: a 100k-image split at canvas 192 is 11.1 GB of uint8 — it fits a
single 16 GB v5e chip beside the 7.4M-param model. Larger-than-HBM sets
(full HaGRID at canvas 192 is ~45 GB) shard naturally over a mesh's
'data' axis — each chip holds N/d samples and gathers within its shard
(within-shard shuffle, the standard sharded-input recipe); that variant
is not wired yet and ``DeviceCacheLoader`` raises under a mesh.

No reference counterpart: the torch pipeline re-decodes JPEGs in worker
processes every epoch (reference libs/load.py:280-305).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterator

import numpy as np

from hgr_tpu.data.loader import BatchLoader

_CACHED_KEYS = ("canvas", "orig_to_canvas", "sizes_hw", "joints",
                "joints_vis", "label")


class DeviceCacheLoader(BatchLoader):
    """Drop-in ``BatchLoader`` that builds a device-resident cache on the
    first iteration and gathers batches from it afterwards."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._cache = None
        self._take = None

    # -- cache construction -------------------------------------------
    def _build_cache(self) -> None:
        import jax
        import jax.numpy as jnp

        # Single-device by design: arrays commit to the default device.
        # (cli/train.py refuses --device_cache under --mesh; the sharded
        # variant is described in the module docstring.)
        n = len(self.index)
        cs = self.canvas_size
        cache = {
            "canvas": jnp.zeros((n, cs, cs, 3), jnp.uint8),
            "orig_to_canvas": jnp.zeros((n, 2, 3), jnp.float32),
            "sizes_hw": jnp.zeros((n, 2), jnp.float32),
            "joints": jnp.zeros((n, self.num_joints, 2), jnp.float32),
            "joints_vis": jnp.zeros((n, self.num_joints), jnp.float32),
            "label": jnp.zeros((n,), jnp.int32),
        }

        # Donating the cache keeps peak memory at cache + one batch.
        @partial(jax.jit, donate_argnums=0)
        def write(cache, block, start):
            return {
                k: jax.lax.dynamic_update_slice_in_dim(
                    cache[k], block[k], start, axis=0)
                for k in cache
            }

        # Stream the split through the parent loader (native decode pool,
        # prefetch thread) in INDEX ORDER: batch b covers samples
        # [b*bs, b*bs+valid).
        shuffle_was, epoch_was, drop_was = (
            self.shuffle, self._epoch, self.drop_last)
        self.shuffle = False
        self.drop_last = False
        try:
            start = 0
            for batch in BatchLoader.__iter__(self):
                valid = min(self.batch_size, n - start)
                block = {k: jnp.asarray(batch[k][:valid])
                         for k in _CACHED_KEYS}
                cache = write(cache, block, start)
                start += valid
            assert start == n, f"cache fill covered {start}/{n} samples"
        finally:
            self.shuffle, self._epoch, self.drop_last = (
                shuffle_was, epoch_was, drop_was)

        @jax.jit
        def take(cache, idx):
            return {k: jnp.take(v, idx, axis=0) for k, v in cache.items()}

        self._cache = cache
        self._take = take

    # -- iteration ----------------------------------------------------
    def __iter__(self) -> Iterator[Dict]:
        if self._cache is None:
            self._build_cache()
        import jax.numpy as jnp

        bs = self.batch_size
        for ids, valid in self._batch_ids():
            batch = dict(self._take(self._cache, jnp.asarray(
                np.ascontiguousarray(ids, np.int32))))
            mask = np.zeros((bs,), np.float32)
            mask[:valid] = 1.0
            batch["valid"] = mask
            yield batch
