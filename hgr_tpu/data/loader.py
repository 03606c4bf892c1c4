"""Host-side batch loader: decode -> stage -> prefetch to device.

Replaces the reference's torch DataLoader worker processes
(reference libs/load.py:280-305). Decoding and canvas staging run on a
thread pool (optionally backed by the native C++ JPEG decoder,
hgr_tpu.data.native); batches are assembled into pinned numpy buffers
and a small prefetch queue keeps the accelerator fed while the device
does ALL augmentation/warping (hgr_tpu.data.pipeline).

Static-shape guarantees for jit: every batch has exactly ``batch_size``
samples (train: drop-last; eval: pad with repeats and carry a per-sample
``valid`` float mask so epoch metrics count every real sample exactly
once — the reference evaluates the full set via drop_last=False
DataLoaders, libs/load.py:289-305).
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
import warnings
from typing import Dict, Iterator

import numpy as np

from hgr_tpu.data.dataset import AnnotationIndex


def _decode_image(path: str) -> np.ndarray:
    """Decode to BGR uint8 (cv2 order — the reference trains on BGR,
    libs/load.py:54; we preserve that)."""
    try:
        from hgr_tpu.data.native import decode_jpeg_bgr

        img = decode_jpeg_bgr(path)
        if img is not None:
            return img
    except Exception:
        pass
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError(f"Fail to read {path}")
        return img
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))[..., ::-1]


class BatchLoader:
    """Iterable of staged numpy batches in the device pipeline's format."""

    def __init__(
        self,
        index: AnnotationIndex,
        batch_size: int,
        canvas_size: int = 256,
        num_joints: int = 21,
        shuffle: bool = False,
        seed: int = 42,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 2,
        window_frac: float = 0.75,
        process_count: int = 1,
        process_index: int = 0,
    ):
        """``process_count``/``process_index`` > multi-host data
        parallelism (parallel.distributed): every process walks the
        IDENTICAL global batch order (same seed, same epoch counter, so
        the shuffle permutation agrees everywhere) but decodes/stages
        only its contiguous row-slice — rows [pi*B/N, (pi+1)*B/N) of
        each global batch. parallel.mesh.shard_batch reassembles the
        slices into the global device array, making the global batch
        bit-identical to single-process training at the same
        ``batch_size``."""
        if batch_size % max(1, process_count):
            raise ValueError(
                f"batch_size {batch_size} must divide by process_count "
                f"{process_count}")
        if not (0 <= process_index < max(1, process_count)):
            raise ValueError(
                f"process_index {process_index} out of range for "
                f"process_count {process_count}")
        self.index = index
        self.process_count = max(1, process_count)
        self.process_index = process_index
        self.local_batch = batch_size // self.process_count
        self.batch_size = batch_size
        self.canvas_size = canvas_size
        self.window_frac = window_frac
        self.num_joints = num_joints
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._epoch = 0
        self._labels = index.labels()
        self._pool = (
            concurrent.futures.ThreadPoolExecutor(self.num_workers)
            if self.num_workers > 1 else None)

    def __len__(self) -> int:
        n = len(self.index)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _load_one(self, i: int):
        from hgr_tpu.data.pipeline import stage_image

        s = self.index.samples[i]
        img = _decode_image(s.image_path)
        canvas, affine, (h, w) = stage_image(
            img, self.canvas_size, self.window_frac)
        lm = np.asarray(s.landmark, np.float32).reshape(-1, 2)
        joints = np.zeros((self.num_joints, 2), np.float32)
        vis = np.zeros((self.num_joints,), np.float32)
        if lm.shape[0]:
            # denormalize (reference libs/load.py:66-67)
            joints[: lm.shape[0], 0] = lm[:, 0] * w
            joints[: lm.shape[0], 1] = lm[:, 1] * h
            vis[: lm.shape[0]] = 1.0
        return canvas, affine, (h, w), joints, vis, self._labels[i]

    def _assemble(self, ids: np.ndarray, valid: int) -> Dict[str, np.ndarray]:
        # ``ids``/``valid`` describe the GLOBAL batch; materialize only
        # this process's contiguous row-slice (process_count=1: all).
        g_mask = np.zeros((self.batch_size,), np.float32)
        g_mask[:valid] = 1.0
        lo = self.process_index * self.local_batch
        ids = ids[lo:lo + self.local_batch]
        mask = g_mask[lo:lo + self.local_batch]
        bs = self.local_batch
        cs = self.canvas_size
        batch = {
            "canvas": np.zeros((bs, cs, cs, 3), np.uint8),
            "orig_to_canvas": np.zeros((bs, 2, 3), np.float32),
            "sizes_hw": np.zeros((bs, 2), np.float32),
            "joints": np.zeros((bs, self.num_joints, 2), np.float32),
            "joints_vis": np.zeros((bs, self.num_joints), np.float32),
            "label": np.zeros((bs,), np.int32),
        }
        if self._native_batch(ids, batch):
            batch["valid"] = mask
            return batch
        if self._pool is not None:
            results = list(self._pool.map(self._load_one, ids))
        else:
            results = [self._load_one(i) for i in ids]
        for k, (canvas, affine, (h, w), joints, vis, label) in enumerate(
                results):
            batch["canvas"][k] = canvas
            batch["orig_to_canvas"][k] = affine
            batch["sizes_hw"][k] = (h, w)
            batch["joints"][k] = joints
            batch["joints_vis"][k] = vis
            batch["label"][k] = label
        batch["valid"] = mask
        return batch

    def _native_batch(self, ids: np.ndarray, batch: Dict[str, np.ndarray]
                      ) -> bool:
        """Whole-batch decode+stage through the C++ runtime
        (native/hgr_native.cpp); falls back when unavailable or when any
        decode fails (e.g. non-JPEG files)."""
        try:
            from hgr_tpu.data import native
        except Exception:
            return False
        if not native.available():
            return False
        paths = [self.index.samples[i].image_path for i in ids]
        if not all(p.endswith((".jpg", ".jpeg")) for p in paths):
            return False
        res = native.stage_batch(
            paths, self.canvas_size, num_threads=self.num_workers,
            out_canvases=batch["canvas"], out_affines=batch["orig_to_canvas"],
            out_sizes=batch["sizes_hw"], window_frac=self.window_frac)
        if res is None or not res[3].all():
            return False
        for k, i in enumerate(ids):
            s = self.index.samples[i]
            lm = np.asarray(s.landmark, np.float32).reshape(-1, 2)
            if lm.shape[0]:
                h, w = batch["sizes_hw"][k]
                batch["joints"][k, : lm.shape[0], 0] = lm[:, 0] * w
                batch["joints"][k, : lm.shape[0], 1] = lm[:, 1] * h
                batch["joints_vis"][k, : lm.shape[0]] = 1.0
            batch["label"][k] = self._labels[i]
        return True

    def _batch_ids(self) -> Iterator[np.ndarray]:
        n = len(self.index)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        bs = self.batch_size
        for start in range(0, n, bs):
            ids = order[start:start + bs]
            if len(ids) < bs:
                if self.drop_last:
                    return
                pad = np.resize(ids, bs)  # repeat to pad; 'valid' masks them
                yield pad, len(ids)
                return
            yield ids, bs

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate with background prefetch of ``prefetch`` batches.

        Producer-thread exceptions (e.g. unreadable images, mirroring the
        reference's hard error at libs/load.py:59-60) re-raise in the
        consumer instead of silently truncating the epoch.

        Abandoning the iterator early (``next(iter(loader))``, or an
        exception mid-epoch) must not leak the producer: its puts poll a
        stop flag, and the consumer's ``finally`` sets it, drains the
        queue, and joins the thread."""
        # maxsize=0 would mean UNBOUNDED in queue.Queue — clamp so
        # prefetch=0 behaves as "minimal prefetch", not "whole epoch".
        work: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        sentinel = object()
        stop = threading.Event()
        error: list = []

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    work.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for ids, valid in self._batch_ids():
                    if stop.is_set():
                        return
                    if not put(self._assemble(ids, valid)):
                        return
            except BaseException as e:  # noqa: BLE001 — repropagated below
                error.append(e)
            finally:
                put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = work.get()
                if item is sentinel:
                    break
                yield item
            if error:
                raise error[0]
        finally:
            stop.set()
            try:
                while True:
                    work.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
            if t.is_alive():
                # daemon status prevents a hang at interpreter exit, but
                # make a stuck producer (e.g. slow NFS read inside
                # _assemble) visible instead of silently leaking it
                warnings.warn("loader producer thread still alive after "
                              "5s join timeout; abandoning it",
                              RuntimeWarning, stacklevel=2)
