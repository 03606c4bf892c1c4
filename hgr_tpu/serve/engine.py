"""Online serving: dynamic micro-batching around the jitted graphs.

Beyond-reference capability. The reference's only serving story is a
frame-serial script holding two onnxruntime sessions (detect.py:171-207,
one request at a time, no batching, no metrics). Production TPU serving
is shaped by two hardware facts:

  * a jitted XLA program has a fixed batch dimension — variable load
    must be bucketed onto a few pre-compiled batch sizes, not traced
    per-request;
  * the chip reaches throughput only when batched (BENCH_LOG: 1 crop
    per dispatch ~ 30/s tunnel-bound, batch-32 ~ 957 crops/s) — so
    concurrent requests should share a device dispatch.

``MicroBatcher`` implements the standard dynamic-batching loop: requests
queue; a dispatcher thread drains up to ``max_batch`` of them or waits
at most ``max_wait_ms`` for stragglers; the batch pads up to the nearest
power-of-two bucket (bounding the number of compiled executables) and
runs as ONE device call; per-request futures resolve with their slice.
``ServeMetrics`` tracks request latency percentiles, batch-size
distribution, and throughput — the observability the reference lacks.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np


class ServeMetrics:
    """Thread-safe request/batch counters with latency percentiles."""

    def __init__(self, max_samples: int = 8192):
        self._lock = threading.Lock()
        self._latencies: List[float] = []
        self._max_samples = max_samples
        self.requests = 0
        self.batches = 0
        self.errors = 0
        self.padded_items = 0
        self.batch_hist: Dict[int, int] = {}
        self._t0 = time.monotonic()

    def record_batch(self, n_real: int, n_padded: int,
                     request_latencies: Sequence[float]) -> None:
        with self._lock:
            self.requests += n_real
            self.batches += 1
            self.padded_items += n_padded - n_real
            self.batch_hist[n_padded] = self.batch_hist.get(n_padded, 0) + 1
            self._latencies.extend(request_latencies)
            if len(self._latencies) > self._max_samples:
                # keep the newest window
                self._latencies = self._latencies[-self._max_samples:]

    def record_error(self, n: int = 1) -> None:
        with self._lock:
            self.errors += n

    def snapshot(self) -> Dict[str, Any]:
        with self._lock:
            lat = np.asarray(self._latencies, np.float64)
            elapsed = max(time.monotonic() - self._t0, 1e-9)
            out: Dict[str, Any] = {
                "requests": self.requests,
                "batches": self.batches,
                "errors": self.errors,
                "padded_items": self.padded_items,
                "batch_hist": dict(sorted(self.batch_hist.items())),
                "requests_per_s": self.requests / elapsed,
            }
            if lat.size:
                out["latency_ms"] = {
                    "p50": float(np.percentile(lat, 50) * 1e3),
                    "p90": float(np.percentile(lat, 90) * 1e3),
                    "p99": float(np.percentile(lat, 99) * 1e3),
                    "mean": float(lat.mean() * 1e3),
                }
            return out


class _AggState:
    """Shared completion state behind one ``submit_many`` aggregate
    Future: a results list filled by slot index and a lock-guarded
    remaining counter; the aggregate resolves exactly once when the last
    slot lands (first recorded exception wins)."""

    __slots__ = ("agg", "results", "remaining", "error", "lock")

    def __init__(self, agg: Future, n: int):
        self.agg = agg
        self.results: List[Any] = [None] * n
        self.remaining = n
        self.error: Optional[BaseException] = None
        self.lock = threading.Lock()

    def land(self, i: int, value: Any, exc: Optional[BaseException]) -> None:
        with self.lock:
            if exc is not None and self.error is None:
                self.error = exc
            elif exc is None:
                self.results[i] = value
            self.remaining -= 1
            done = self.remaining == 0
        if done:
            if self.error is not None:
                self.agg.set_exception(self.error)
            else:
                self.agg.set_result(self.results)


class _Slot:
    """Future-shaped handle for one ``submit_many`` item — duck-types
    the subset of concurrent.futures.Future the dispatcher/completer
    touch (cancelled / set_result / set_exception) at a fraction of the
    cost (no per-item condition variable)."""

    __slots__ = ("state", "i")

    def __init__(self, state: _AggState, i: int):
        self.state = state
        self.i = i

    @staticmethod
    def cancelled() -> bool:
        return False

    def set_result(self, value: Any) -> None:
        self.state.land(self.i, value, None)

    def set_exception(self, exc: BaseException) -> None:
        self.state.land(self.i, None, exc)


def _buckets_upto(max_batch: int) -> List[int]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


class MicroBatcher:
    """Dynamic micro-batching dispatcher around a batched runner.

    ``run_batch(inputs) -> outputs`` takes a stacked ``(B, ...)`` numpy
    array whose B is always one of ``buckets`` and returns a sequence
    indexable per item (a list, or an array whose leading axis is B).

    Pipelined mode (``pipeline_depth`` > 1): pass ``dispatch_batch`` +
    ``materialize`` instead of ``run_batch``. ``dispatch_batch(stacked)``
    must be NON-BLOCKING — with a jitted JAX callable that is the
    default: the call enqueues device work and returns device arrays
    immediately (XLA async dispatch). ``materialize(handle)`` blocks on
    the result and converts it to the per-item outputs. The dispatcher
    thread then keeps up to ``pipeline_depth`` batches in flight while a
    completion thread resolves futures in FIFO order, so host->device
    link latency (PCIe on a pod host; the axon tunnel here) overlaps
    device compute instead of serializing with it — throughput becomes
    device-bound while per-request latency still includes one link
    round-trip. This is the TPU-native answer to the reference's
    frame-serial onnxruntime loop (detect.py:171-207).
    """

    def __init__(
        self,
        run_batch: Optional[Callable[[np.ndarray], Any]] = None,
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
        buckets: Optional[Sequence[int]] = None,
        metrics: Optional[ServeMetrics] = None,
        name: str = "microbatcher",
        dispatch_batch: Optional[Callable[[np.ndarray], Any]] = None,
        materialize: Optional[Callable[[Any], Any]] = None,
        pipeline_depth: int = 1,
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        if (dispatch_batch is None) != (materialize is None):
            raise ValueError(
                "dispatch_batch and materialize come as a pair")
        if run_batch is None and dispatch_batch is None:
            raise ValueError("need run_batch or dispatch_batch+materialize")
        if pipeline_depth > 1 and dispatch_batch is None:
            raise ValueError(
                "pipeline_depth > 1 requires dispatch_batch+materialize "
                "(run_batch blocks, so there is nothing to overlap)")
        self.run_batch = run_batch
        self.dispatch_batch = dispatch_batch
        self.materialize = materialize
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self.buckets = sorted(set(buckets or _buckets_upto(max_batch)))
        if self.buckets[-1] < max_batch:
            self.buckets.append(max_batch)
        self.metrics = metrics or ServeMetrics()
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # Hard shutdown (stop() after a wedged dispatcher join): makes a
        # dispatcher blocked on a full _inflight queue fail its batch
        # instead of leaking, and the completer exit without a sentinel.
        self._hard_stop = threading.Event()
        # Orders submit()'s stop-check+enqueue against stop()'s
        # flag-set: without it a submit that passed the check could
        # enqueue AFTER stop() drained the queue, leaving its Future
        # unresolved forever (the caller would sit in result()).
        self._submit_lock = threading.Lock()
        # In-flight pipeline: (handle, futs, t_in, n_real, n_bucket).
        # Bounded at pipeline_depth — a full queue backpressures the
        # dispatcher so device memory holds at most depth batches.
        self._inflight: "queue.Queue" = queue.Queue(
            maxsize=self.pipeline_depth)
        self._completer: Optional[threading.Thread] = None
        if self.dispatch_batch is not None:
            self._completer = threading.Thread(
                target=self._complete_loop, name=name + "-complete",
                daemon=True)
            self._completer.start()
        self._thread = threading.Thread(
            target=self._loop, name=name, daemon=True)
        self._thread.start()

    # -- client API ------------------------------------------------------

    def submit(self, x: np.ndarray) -> Future:
        """Enqueue one item; resolves to run_batch's per-item output."""
        fut: Future = Future()
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("MicroBatcher is stopped")
            self._q.put((np.asarray(x), fut, time.monotonic()))
        return fut

    def submit_many(self, xs: Sequence[np.ndarray]) -> Future:
        """Enqueue a window of items behind ONE aggregate Future that
        resolves to the list of per-item outputs (first error wins).

        The per-request resolution cost of ``submit`` — a
        concurrent.futures.Future allocation, its condition-variable
        set_result, and a client-side result() wait EACH — collapses to
        one Future per window plus a slot write and a counter decrement
        per item. On a single-core serving host that Python work is the
        measured 13.5% gap to the device ceiling (BENCH_LOG round 4);
        windowed clients (tools/serve_bench.py --window) should submit
        through this. Items still batch individually, so cross-client
        micro-batching is unchanged."""
        xs = [np.asarray(x) for x in xs]
        agg: Future = Future()
        if not xs:
            agg.set_result([])
            return agg
        shared = _AggState(agg, len(xs))
        now = time.monotonic()
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("MicroBatcher is stopped")
            for i, x in enumerate(xs):
                self._q.put((x, _Slot(shared, i), now))
        return agg

    def __call__(self, x: np.ndarray, timeout: Optional[float] = None):
        return self.submit(x).result(timeout=timeout)

    def warm(self, example: np.ndarray) -> None:
        """Pre-compile every bucket size (one device call each) so the
        first real request never pays an XLA compile."""
        for b in self.buckets:
            stacked = np.broadcast_to(
                example, (b,) + tuple(example.shape)).copy()
            if self.dispatch_batch is not None:
                self.materialize(self.dispatch_batch(stacked))
            else:
                self.run_batch(stacked)

    def stop(self, timeout: float = 5.0) -> None:
        with self._submit_lock:
            self._stop.set()  # no submit can enqueue past this point
        self._q.put(None)  # wake the dispatcher
        self._thread.join(timeout=timeout)
        if self._completer is not None:
            # hard-stop is the bounded exit in every case: the completer
            # drains whatever is queued, then exits on its next empty
            # poll; a dispatcher wedged on a full _inflight fails its
            # batch and exits. The sentinel is only an optimization for
            # the clean path (immediate wake) — and must be put_nowait:
            # a blocking put would wedge stop() itself on a full queue
            # whose completer is stuck inside materialize (regression
            # test: test_hard_stop_unwedges_blocked_dispatcher).
            self._hard_stop.set()
            if not self._thread.is_alive():
                try:
                    self._inflight.put_nowait(None)
                except queue.Full:
                    pass  # completer exits via hard-stop after draining
            self._completer.join(timeout=timeout)
            # fail anything still in flight (completer exited/timed out)
            while True:
                try:
                    item = self._inflight.get_nowait()
                except queue.Empty:
                    break
                if item is not None:
                    self._fail(item[1], item[3],
                               RuntimeError("server stopped"))
        # fail any requests still queued
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(RuntimeError("server stopped"))

    # -- dispatcher ------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def _loop(self) -> None:
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            if first is None:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    item = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if item is None:
                    break
                batch.append(item)
            self._run(batch)

    def _run(self, batch) -> None:
        xs = [b[0] for b in batch]
        futs = [b[1] for b in batch]
        t_in = [b[2] for b in batch]
        n = len(xs)
        nb = self._bucket(n)
        stacked = np.stack(xs + [xs[-1]] * (nb - n))
        if self.dispatch_batch is not None:
            try:
                handle = self.dispatch_batch(stacked)
            except Exception as exc:
                self._fail(futs, n, exc)
                return
            # blocks when pipeline_depth batches are already in flight;
            # bounded wait so a hard stop can't leak this thread (and
            # its batch's futures) on a full queue
            item = (handle, futs, t_in, n, nb)
            while True:
                try:
                    self._inflight.put(item, timeout=0.1)
                    return
                except queue.Full:
                    if self._hard_stop.is_set():
                        self._fail(futs, n,
                                   RuntimeError("server stopped"))
                        return
        try:
            outputs = self.run_batch(stacked)
        except Exception as exc:  # propagate to every caller in the batch
            self._fail(futs, n, exc)
            return
        self._resolve(outputs, futs, t_in, n, nb)

    def _complete_loop(self) -> None:
        """FIFO completion: block on the oldest in-flight batch, resolve
        its futures. Runs concurrently with the dispatcher, which is
        already assembling + dispatching the next batches."""
        while True:
            try:
                item = self._inflight.get(timeout=0.1)
            except queue.Empty:
                if self._hard_stop.is_set():
                    return
                continue
            if item is None:
                return
            handle, futs, t_in, n, nb = item
            try:
                outputs = self.materialize(handle)
            except Exception as exc:
                self._fail(futs, n, exc)
                continue
            self._resolve(outputs, futs, t_in, n, nb)

    def _fail(self, futs, n, exc) -> None:
        self.metrics.record_error(n)
        for f in futs:
            if not f.cancelled():
                f.set_exception(exc)

    def _resolve(self, outputs, futs, t_in, n, nb) -> None:
        done = time.monotonic()
        for i, f in enumerate(futs):
            if not f.cancelled():
                f.set_result(outputs[i])
        self.metrics.record_batch(n, nb, [done - t for t in t_in])


class DetectorService:
    """Serves FULL frames through the fused detect->crop->classify graph
    (infer/detect.py:HandGesturePipeline) with dynamic batching.

    One frame geometry per service instance: the fused graph is compiled
    per (H, W) and online traffic from a camera has a fixed geometry —
    mixed geometries should run separate services (or the offline
    ``detect_to_video`` path, which re-buckets per shape).

    Input per request: (H, W, 3) uint8 BGR frame. Output: the pipeline's
    per-frame dict (label/label_name/score/box/landmarks) or None when
    the detection score fails the 0.2 gate (reference detect.py:140).
    """

    def __init__(
        self,
        pipeline,
        frame_hw: Sequence[int],
        max_batch: int = 16,
        max_wait_ms: float = 10.0,
        metrics: Optional[ServeMetrics] = None,
    ):
        self.frame_hw = tuple(frame_hw)
        self.pipeline = pipeline
        self.batcher = MicroBatcher(
            pipeline.infer_frames, max_batch=max_batch,
            max_wait_ms=max_wait_ms, metrics=metrics, name="detector-serve")
        self.metrics = self.batcher.metrics

    def warm(self) -> None:
        h, w = self.frame_hw
        self.batcher.warm(np.zeros((h, w, 3), np.uint8))

    def submit(self, frame_u8: np.ndarray) -> Future:
        h, w = self.frame_hw
        if frame_u8.shape != (h, w, 3):
            raise ValueError(
                f"expected ({h}, {w}, 3) uint8 frame, got {frame_u8.shape}")
        return self.batcher.submit(frame_u8)

    def submit_many(self, frames_u8: Sequence[np.ndarray]) -> Future:
        """One aggregate future for a window of frames (submit_many)."""
        h, w = self.frame_hw
        for f in frames_u8:
            if f.shape != (h, w, 3):
                raise ValueError(
                    f"expected ({h}, {w}, 3) uint8 frame, got {f.shape}")
        return self.batcher.submit_many(frames_u8)

    def detect(self, frame_u8: np.ndarray,
               timeout: Optional[float] = None):
        return self.submit(frame_u8).result(timeout=timeout)

    def stop(self) -> None:
        self.batcher.stop()


class ClassifierService:
    """Serves pre-cropped BGR uint8 gesture crops through ONE jitted
    2-output forward with dynamic batching.

    Input per request: (H, W, 3) uint8 BGR crop at the model's image
    size. Output: dict(label, label_name, probs, landmarks) — landmarks
    in crop pixel coordinates (heatmap argmax x4, reference
    detect.py:149-157 without the box re-projection).

    Pass PTQ variables from infer/quant.py:quantize_model to serve the
    int8 backbone; the graph structure is identical either way.
    """

    def __init__(
        self,
        model,
        variables: Dict[str, Any],
        class_names: Optional[Dict[str, int]] = None,
        max_batch: int = 64,
        max_wait_ms: float = 5.0,
        metrics: Optional[ServeMetrics] = None,
        pipeline_depth: int = 4,
    ):
        import jax
        import jax.numpy as jnp

        from hgr_tpu.config import IMAGENET_MEAN, IMAGENET_STD
        from hgr_tpu.models.multitasknet import heatmaps_to_nchw
        from hgr_tpu.ops.heatmap import get_max_preds

        self.image_size = tuple(model.image_size)
        self.id_to_name = ({v: k for k, v in class_names.items()}
                           if class_names else {})

        def fwd(crops_u8):
            x = crops_u8.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            logits, hmap, _ = model.apply(variables, x, train=False,
                                          need_attnmap=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            hm = heatmaps_to_nchw(hmap)
            lm, maxvals = get_max_preds(hm)
            scale = self.image_size[0] // hm.shape[-2]  # x4 at 192->48
            return probs, lm * scale, maxvals

        self._fwd = jax.jit(fwd)

        # Split the old blocking run_batch into its two halves so the
        # MicroBatcher can pipeline: dispatch enqueues device work and
        # returns immediately (XLA async dispatch); materialize blocks
        # on the transfer and builds the per-request dicts.
        def dispatch_batch(stacked: np.ndarray):
            return self._fwd(stacked)

        def materialize(handle):
            probs, lm, mv = handle
            probs = np.asarray(probs)
            lm = np.asarray(lm)
            labels = probs.argmax(-1)
            return [
                {
                    "label": int(labels[i]),
                    "label_name": self.id_to_name.get(
                        int(labels[i]), str(int(labels[i]))),
                    "probs": probs[i],
                    "landmarks": lm[i],
                }
                for i in range(len(probs))
            ]

        self.batcher = MicroBatcher(
            dispatch_batch=dispatch_batch, materialize=materialize,
            pipeline_depth=pipeline_depth,
            max_batch=max_batch, max_wait_ms=max_wait_ms,
            metrics=metrics, name="classifier-serve")
        self.metrics = self.batcher.metrics

    def warm(self) -> None:
        h, w = self.image_size
        self.batcher.warm(np.zeros((h, w, 3), np.uint8))

    def submit(self, crop_u8: np.ndarray) -> Future:
        h, w = self.image_size
        if crop_u8.shape != (h, w, 3):
            raise ValueError(
                f"expected ({h}, {w}, 3) uint8 crop, got {crop_u8.shape}")
        return self.batcher.submit(crop_u8)

    def submit_many(self, crops_u8: Sequence[np.ndarray]) -> Future:
        """One aggregate future for a window of crops (submit_many)."""
        h, w = self.image_size
        for c in crops_u8:
            if c.shape != (h, w, 3):
                raise ValueError(
                    f"expected ({h}, {w}, 3) uint8 crop, got {c.shape}")
        return self.batcher.submit_many(crops_u8)

    def classify(self, crop_u8: np.ndarray,
                 timeout: Optional[float] = None) -> Dict[str, Any]:
        return self.submit(crop_u8).result(timeout=timeout)

    def stop(self) -> None:
        self.batcher.stop()
