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

Sizing: arrays are stored as FLAT ``(n, features)`` rows (see
``_flat_shapes``) so they occupy their nominal byte size — in natural
shapes, XLA's (sublane, lane) tiling pads the trailing dims (uint8
(..., 160, 3) rounds 160 lanes up to 256; f32 (..., 21, 2) rounds to
(24, 128)), which inflated a canvas-160 100k-image cache from 8.7 GB to
19.2 GB and OOM'd a 16 GB chip. Flat, a 100k split at canvas 160 is
7.9 GB and a canvas-192 one 11.1 GB — both fit a single 16 GB v5e chip
beside the 7.4M-param model. Larger-than-HBM sets
(full HaGRID at canvas 192 is ~45 GB) shard over a mesh's 'data' axis:
``ShardedDeviceCacheLoader`` gives each chip a contiguous N/d-sample
shard and serves batches with WITHIN-SHARD shuffling through a
``shard_map`` gather — each device reads only its local shard, so no
collective ever moves canvas bytes over ICI. Within-shard (vs global)
shuffle is the standard sharded-input recipe; every real sample still
trains exactly once per epoch (per-shard tail repeats carry valid=0
masks, consumed by the loss/metrics masking like the streaming tail).

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


def _flat_shapes(n, cs, num_joints):
    """Per-key (flat row length, unflattened trailing shape, dtype).

    Cached arrays are stored as 2-D ``(n, features)`` rows, NOT in their
    natural shapes: XLA tiles a TPU allocation's trailing two dims (uint8
    (..., 160, 3) pads 160 lanes -> 256, f32 (..., 21, 2) pads to (24,
    128)), which blew a 160-canvas 100k-image cache from 8.7 GB nominal
    to 19.2 GB and OOM'd the chip. A flat row of 128-aligned length (or
    any length on a tiny sidecar) stores at nominal size; the jitted
    gather reshapes the batch back AFTER the take, where the padded form
    is one batch, not the whole split.
    """
    return {
        "canvas": (cs * cs * 3, (cs, cs, 3), np.uint8),
        "orig_to_canvas": (6, (2, 3), np.float32),
        "sizes_hw": (2, (2,), np.float32),
        "joints": (num_joints * 2, (num_joints, 2), np.float32),
        "joints_vis": (num_joints, (num_joints,), np.float32),
        "label": (1, (), np.int32),
    }


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
        spec = _flat_shapes(n, cs, self.num_joints)
        cache = {k: jnp.zeros((n, flat), jnp.dtype(dt))
                 for k, (flat, _, dt) in spec.items()}

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
                block = {k: jnp.asarray(
                    np.ascontiguousarray(batch[k][:valid]).reshape(
                        valid, spec[k][0]))
                         for k in _CACHED_KEYS}
                cache = write(cache, block, start)
                start += valid
            assert start == n, f"cache fill covered {start}/{n} samples"
        finally:
            self.shuffle, self._epoch, self.drop_last = (
                shuffle_was, epoch_was, drop_was)

        @jax.jit
        def take(cache, idx):
            b = idx.shape[0]
            return {k: jnp.take(v, idx, axis=0).reshape((b,) + spec[k][1])
                    for k, v in cache.items()}

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


class ShardedDeviceCacheLoader(BatchLoader):
    """Device cache sharded over a pure-DP mesh's 'data' axis.

    Shard s (of d) owns the contiguous global samples
    ``[s*n_local, min((s+1)*n_local, N))`` with ``n_local = ceil(N/d)``.
    Every epoch each shard permutes ITS OWN rows (within-shard shuffle),
    pads its sequence to a common per-shard batch length by repetition
    (``valid`` masks the repeats), and batches are materialized with a
    ``shard_map`` gather: device s takes rows from its local cache shard
    only. Batch layout row-blocks [shard0 | shard1 | ...] matches the
    'data'-axis batch sharding the parallel train step expects, so
    ``parallel.mesh.shard_batch`` is a no-op on these arrays.
    """

    def __init__(self, index, mesh, **kwargs):
        super().__init__(index, **kwargs)
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        if set(axis_sizes) != {"data"}:
            raise NotImplementedError(
                f"ShardedDeviceCacheLoader needs a pure-DP ('data',) mesh,"
                f" got axes {axis_sizes}")
        self.mesh = mesh
        self.d = axis_sizes["data"]
        if self.batch_size % self.d != 0:
            raise ValueError(
                f"batch_size {self.batch_size} not divisible by the "
                f"'data' axis size {self.d}")
        n = len(self.index)
        self.n_local = -(-n // self.d)  # ceil
        self._cache = None
        self._take = None

    def __len__(self) -> int:
        return -(-self.n_local // (self.batch_size // self.d))

    def _build_cache(self) -> None:
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # pragma: no cover - older jax
            from jax.experimental.shard_map import shard_map

        n = len(self.index)
        n_pad = self.n_local * self.d
        cs = self.canvas_size
        sharded = NamedSharding(self.mesh, P("data"))
        spec = _flat_shapes(n_pad, cs, self.num_joints)

        def _z(key):
            flat, _, dt = spec[key]
            return jax.device_put(jnp.zeros((n_pad, flat), jnp.dtype(dt)),
                                  sharded)

        # Rows past N exist only on shards with no real samples (N < d*
        # n_local). They are always masked valid=0, but their bytes DO
        # flow through the augment math before masking — a zero affine
        # is singular and a zero size divides by zero, and NaN*0 = NaN
        # would poison the masked loss. Seed them with benign values:
        # identity affine, canvas-sized dims. (Rows are stored FLAT —
        # see _flat_shapes — so the identity affine is its 6-vector.)
        ident = jnp.tile(jnp.asarray([[1.0, 0, 0, 0, 1.0, 0]],
                                     jnp.float32), (n_pad, 1))
        cache = {
            "canvas": _z("canvas"),
            "orig_to_canvas": jax.device_put(ident, sharded),
            "sizes_hw": jax.device_put(
                jnp.full((n_pad, 2), float(cs), jnp.float32), sharded),
            "joints": _z("joints"),
            "joints_vis": _z("joints_vis"),
            "label": _z("label"),
        }

        # Block writes cross shard boundaries; GSPMD compiles the
        # masked per-shard updates (one-time build cost).
        @partial(jax.jit, donate_argnums=0)
        def write(cache, block, start):
            return {
                k: jax.lax.dynamic_update_slice_in_dim(
                    cache[k], block[k], start, axis=0)
                for k in cache
            }

        shuffle_was, epoch_was, drop_was = (
            self.shuffle, self._epoch, self.drop_last)
        self.shuffle = False
        self.drop_last = False
        try:
            start = 0
            with self.mesh:
                for batch in BatchLoader.__iter__(self):
                    valid = min(self.batch_size, n - start)
                    block = {k: jnp.asarray(
                        np.ascontiguousarray(batch[k][:valid]).reshape(
                            valid, spec[k][0]))
                             for k in _CACHED_KEYS}
                    cache = write(cache, block, start)
                    start += valid
            assert start == n, f"cache fill covered {start}/{n}"
        finally:
            self.shuffle, self._epoch, self.drop_last = (
                shuffle_was, epoch_was, drop_was)

        def local_take(cache, idx):
            b = idx.shape[0]
            return {k: jnp.take(v, idx, axis=0).reshape((b,) + spec[k][1])
                    for k, v in cache.items()}

        self._cache = cache
        self._take = jax.jit(shard_map(
            local_take, mesh=self.mesh,
            in_specs=(P("data"), P("data")), out_specs=P("data")))
        self._idx_sharding = sharded

    def _epoch_plan(self):
        """Per-batch (local_idx_layout, valid) arrays for one epoch.

        local_idx_layout is (B,) int32 in [0, n_local) arranged in
        per-shard blocks of B/d rows; valid is the matching 0/1 mask.
        Advances the epoch counter exactly like BatchLoader._batch_ids.
        """
        n = len(self.index)
        bl = self.batch_size // self.d
        nb = len(self)
        per_shard_idx, per_shard_valid = [], []
        for s in range(self.d):
            lo = s * self.n_local
            n_real = max(0, min(self.n_local, n - lo))
            order = np.arange(n_real)
            if self.shuffle:
                rng = np.random.RandomState(
                    self.seed + self._epoch * 10007 + s)
                rng.shuffle(order)
            valid = np.ones(n_real, np.float32)
            padded = np.resize(order, nb * bl) if n_real else np.zeros(
                nb * bl, np.int64)
            vpad = np.zeros(nb * bl, np.float32)
            vpad[:n_real] = valid
            per_shard_idx.append(padded.reshape(nb, bl))
            per_shard_valid.append(vpad.reshape(nb, bl))
        self._epoch += 1
        for b in range(nb):
            idx = np.concatenate([p[b] for p in per_shard_idx]).astype(
                np.int32)
            valid = np.concatenate([v[b] for v in per_shard_valid])
            yield idx, valid

    def __iter__(self) -> Iterator[Dict]:
        if self._cache is None:
            self._build_cache()
        import jax
        import jax.numpy as jnp

        with self.mesh:
            for idx, valid in self._epoch_plan():
                idx_dev = jax.device_put(
                    jnp.asarray(idx), self._idx_sharding)
                batch = dict(self._take(self._cache, idx_dev))
                batch["valid"] = valid
                yield batch
