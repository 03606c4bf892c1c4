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

Disk snapshot: pass ``snapshot_dir`` (CLI ``--cache_snapshot``) and the
first build also persists the staged flat rows as per-key ``.npy``
memmaps plus a manifest keyed by fingerprints of (annotations, labels,
staging params, image byte sizes). Later runs — a ``--resume``, a
second recipe on the same split — fill HBM straight from the memmaps,
skipping JPEG decode and canvas staging entirely. Whether that is a
WIN depends on the host's decode-rate-vs-disk-read balance: with the
C++ staging pool on this sandbox's slow virtual disk the snapshot
refill measured SLOWER than re-decoding (BENCH_LOG 'Device-cache
snapshot at scale' — decode+stage is 8 s per 25.6k images here while
the cold disk read of 2 GB costs ~4 min), so reach for it on hosts
where decode dominates: the cv2/PIL fallback decode path, NVMe/page-
cache-warm storage, or a split whose image files were archived away
(the snapshot alone can then serve the split). A stale or partial
snapshot (changed dataset/bytes, crashed build — data files then the
manifest commit by atomic rename) falls back to streaming and rewrites
itself.

No reference counterpart: the torch pipeline re-decodes JPEGs in worker
processes every epoch (reference libs/load.py:280-305).
"""

from __future__ import annotations

import contextlib
import hashlib
import json
import os
import warnings
from functools import partial
from typing import Dict, Iterator, Optional

import numpy as np

from hgr_tpu.data.loader import BatchLoader

_CACHED_KEYS = ("canvas", "orig_to_canvas", "sizes_hw", "joints",
                "joints_vis", "label")

SNAPSHOT_VERSION = 1
_MANIFEST = "manifest.json"


def index_fingerprint(index, canvas_size: int, num_joints: int,
                      window_frac: float) -> str:
    """Identity of the staged byte content of a split.

    Staging is deterministic per sample (pipeline.stage_image), so the
    staged rows are a pure function of (image files, landmarks, labels,
    staging params). This hashes the annotation content + params; pixel
    content is covered separately by ``sizes_fingerprint`` (file byte
    sizes), so a snapshot can still serve a split whose image files
    were archived away."""
    h = hashlib.sha256()
    h.update(f"v{SNAPSHOT_VERSION}|{canvas_size}|{num_joints}|"
             f"{window_frac:.6f}|{len(index)}".encode())
    for s in index.samples:
        h.update(s.image_path.encode())
        h.update(b"|")
        h.update(s.label.encode())
        h.update(np.asarray(s.landmark, np.float32).tobytes())
        h.update(b"\n")
    return h.hexdigest()


def sizes_fingerprint(index):
    """(hexdigest over per-file byte sizes, number of unreadable files).

    A dataset regenerated in place — new pixels, same filenames and
    annotations — almost always changes JPEG sizes, which this catches
    (only a same-size in-place re-encode escapes, like any
    content-hash-free cache key). When EVERY file is missing the split
    exists only as its snapshot; the loader then serves it on the
    annotation fingerprint alone."""
    h = hashlib.sha256()
    missing = 0
    for s in index.samples:
        try:
            h.update(str(os.path.getsize(s.image_path)).encode())
        except OSError:
            missing += 1
            h.update(b"?")
        h.update(b"|")
    return h.hexdigest(), missing


def _snapshot_load(snap_dir: str, fingerprint: str, get_sizes_fp, n: int,
                   spec) -> Optional[Dict[str, np.ndarray]]:
    """Memory-mapped snapshot rows, or None when absent/stale/corrupt.

    ``get_sizes_fp`` is a zero-arg callable returning
    ``sizes_fingerprint(index)`` — a callable (memoized by the caller)
    because the sweep stats every file in the split, and on a stale
    rebuild the writer needs the same digest again."""
    try:
        with open(os.path.join(snap_dir, _MANIFEST)) as f:
            man = json.load(f)
    except (OSError, ValueError):
        return None
    stale = (man.get("version") != SNAPSHOT_VERSION
             or man.get("n") != n
             or man.get("fingerprint") != fingerprint)
    if not stale and "sizes_fingerprint" in man:
        sizes_fp, missing = get_sizes_fp()
        # image bytes changed under unchanged annotations -> stale;
        # but a fully-archived split (every file gone) is served from
        # the snapshot on the annotation fingerprint alone
        stale = sizes_fp != man["sizes_fingerprint"] and missing < n
    if stale:
        warnings.warn(
            f"device-cache snapshot at {snap_dir} is stale (dataset or "
            "staging params changed); rebuilding from images",
            RuntimeWarning, stacklevel=3)
        return None
    out = {}
    for k, (flat, _, dt) in spec.items():
        try:
            arr = np.load(os.path.join(snap_dir, k + ".npy"), mmap_mode="r")
        except (OSError, ValueError):
            return None
        if arr.shape != (n, flat) or arr.dtype != np.dtype(dt):
            return None
        out[k] = arr
    return out


class _SnapshotWriter:
    """Writes staged flat rows into per-key ``.npy.tmp`` memmaps, then
    commits by atomic rename — data files first, manifest LAST. A
    crashed build never leaves a snapshot that parses as valid, and a
    rebuild never truncates files a concurrent reader already mmap'd
    (the reader's old inodes stay alive until its maps close)."""

    def __init__(self, snap_dir: str, fingerprint: str, n: int, spec,
                 meta: Dict):
        self.dir, self.fingerprint, self.n, self.meta = (
            snap_dir, fingerprint, n, meta)
        os.makedirs(snap_dir, exist_ok=True)
        with contextlib.suppress(OSError):  # invalidate any prior snapshot
            os.remove(os.path.join(snap_dir, _MANIFEST))
        self.mm = {
            k: np.lib.format.open_memmap(
                os.path.join(snap_dir, k + ".npy.tmp"), mode="w+",
                dtype=np.dtype(dt), shape=(n, flat))
            for k, (flat, _, dt) in spec.items()
        }

    def write(self, key: str, start: int, rows: np.ndarray) -> None:
        self.mm[key][start:start + len(rows)] = rows

    def commit(self) -> None:
        for k, m in self.mm.items():
            m.flush()
            os.replace(os.path.join(self.dir, k + ".npy.tmp"),
                       os.path.join(self.dir, k + ".npy"))
        man = {"version": SNAPSHOT_VERSION, "fingerprint": self.fingerprint,
               "n": self.n, **self.meta}
        tmp = os.path.join(self.dir, _MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(man, f, indent=2)
        os.replace(tmp, os.path.join(self.dir, _MANIFEST))


def _fill_cache(loader: BatchLoader, cache, write, spec, n: int, mesh=None):
    """Fill the device cache from the snapshot (host reads only) or by
    streaming the split through the host loader (decode + stage), writing
    the snapshot as a side effect when one is configured.

    Returns (cache, loaded_from_snapshot)."""
    import jax.numpy as jnp

    snap_dir = getattr(loader, "snapshot_dir", "")
    ctx = mesh if mesh is not None else contextlib.nullcontext()
    fp = ""
    _sizes: list = []  # memoize the per-file stat sweep across load+write

    def sizes_fp_once():
        if not _sizes:
            _sizes.append(sizes_fingerprint(loader.index))
        return _sizes[0]

    if snap_dir:
        fp = index_fingerprint(loader.index, loader.canvas_size,
                               loader.num_joints, loader.window_frac)
        mm = _snapshot_load(snap_dir, fp, sizes_fp_once, n, spec)
        if mm is not None:
            # ~64 MB upload blocks (row bytes are canvas-dominated)
            rows = max(1, (64 << 20) // (loader.canvas_size ** 2 * 3))
            with ctx:
                for start in range(0, n, rows):
                    stop = min(n, start + rows)
                    block = {k: jnp.asarray(np.ascontiguousarray(
                        mm[k][start:stop])) for k in spec}
                    cache = write(cache, block, start)
            return cache, True

    writer = None
    if snap_dir:
        writer = _SnapshotWriter(snap_dir, fp, n, spec, meta={
            "sizes_fingerprint": sizes_fp_once()[0],
            "canvas_size": loader.canvas_size,
            "num_joints": loader.num_joints,
            "window_frac": loader.window_frac,
        })
    # Stream in INDEX ORDER: batch b covers samples [b*bs, b*bs+valid).
    shuffle_was, epoch_was, drop_was = (
        loader.shuffle, loader._epoch, loader.drop_last)
    loader.shuffle = False
    loader.drop_last = False
    try:
        start = 0
        with ctx:
            for batch in BatchLoader.__iter__(loader):
                valid = min(loader.batch_size, n - start)
                flat = {k: np.ascontiguousarray(
                    batch[k][:valid]).reshape(valid, spec[k][0])
                        for k in _CACHED_KEYS}
                if writer is not None:
                    for k, v in flat.items():
                        writer.write(k, start, v)
                block = {k: jnp.asarray(v) for k, v in flat.items()}
                cache = write(cache, block, start)
                start += valid
        assert start == n, f"cache fill covered {start}/{n} samples"
        if writer is not None:
            writer.commit()
    finally:
        loader.shuffle, loader._epoch, loader.drop_last = (
            shuffle_was, epoch_was, drop_was)
    return cache, False


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

    def __init__(self, *args, snapshot_dir: str = "", **kwargs):
        super().__init__(*args, **kwargs)
        self.snapshot_dir = snapshot_dir
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

        cache, _ = _fill_cache(self, cache, write, spec, n)

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


def make_sharded_write(mesh, n_local: int):
    """Jitted sharded-cache block write: each device merges a replicated
    block into ITS OWN shard through a static-shape masked window.

    A naive sharded dynamic_update_slice is NOT usable here: GSPMD
    lowers it as all-gather(cache) -> update -> reslice, which
    materializes the FULL cache on every device — at real HaGRID scale
    (45 GB over 8 chips) that OOMs each 16 GB chip on the first block
    write. Caught by tools/hagrid_fit --mode virtual (round 4);
    tests/test_device_cache.py compile-checks that this write stays
    collective-free. Per-write traffic is O(block) per device: slice
    the local shard at the clamped offset, where() in the block rows
    whose global index lands in this shard, write the window back.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def _local_write(cache_shard, block_rows, start):
        rows = block_rows.shape[0]
        s = jax.lax.axis_index("data")
        lo = s * n_local
        if rows >= n_local:
            # block spans the whole shard (tiny caches): merge over
            # every local row instead of a sub-window
            g = lo + jnp.arange(n_local)
            sel = (g >= start) & (g < start + rows)
            idx = jnp.clip(g - start, 0, rows - 1)
            want = jnp.take(block_rows, idx, axis=0)
            return jnp.where(sel[:, None], want, cache_shard)
        off = jnp.clip(start - lo, 0, n_local - rows)
        g = lo + off + jnp.arange(rows)  # global rows of the window
        sel = (g >= start) & (g < start + rows)
        idx = jnp.clip(g - start, 0, rows - 1)
        want = jnp.take(block_rows, idx, axis=0)
        existing = jax.lax.dynamic_slice(
            cache_shard, (off, 0), (rows, cache_shard.shape[1]))
        merged = jnp.where(sel[:, None], want, existing)
        return jax.lax.dynamic_update_slice(
            cache_shard, merged, (off, 0))

    @partial(jax.jit, donate_argnums=0)
    def write(cache, block, start):
        start = jnp.asarray(start, jnp.int32)
        return {
            k: shard_map(
                _local_write, mesh=mesh,
                in_specs=(P("data"), P(), P()),
                out_specs=P("data"),
            )(cache[k], block[k], start)
            for k in cache
        }

    return write


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

    def __init__(self, index, mesh, snapshot_dir: str = "", **kwargs):
        super().__init__(index, **kwargs)
        self.snapshot_dir = snapshot_dir
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

        write = make_sharded_write(self.mesh, self.n_local)

        cache, _ = _fill_cache(self, cache, write, spec, n, mesh=self.mesh)

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
