"""Serving engine (hgr_tpu/serve): dynamic micro-batching, metrics,
the classifier service, and the HTTP front end.

Beyond-reference subsystem — the reference serves one frame at a time
through a script (detect.py:171-207); these tests pin the batching
semantics that make concurrent requests share one device dispatch.
"""

import io
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgr_tpu.serve import ClassifierService, MicroBatcher, ServeMetrics


def _sum_runner(calls):
    def run_batch(stacked):
        calls.append(stacked.shape[0])
        return [float(x.sum()) for x in stacked]

    return run_batch


def test_single_request_roundtrip():
    calls = []
    mb = MicroBatcher(_sum_runner(calls), max_batch=8, max_wait_ms=1.0)
    try:
        assert mb(np.full((4,), 2.0)) == 8.0
        assert calls and calls[0] in (1, 2, 4, 8)
    finally:
        mb.stop()


def test_concurrent_requests_share_a_batch():
    calls = []
    release = threading.Event()

    def run_batch(stacked):
        release.wait(5.0)  # hold the first dispatch until all enqueued
        calls.append(stacked.shape[0])
        return [float(x.sum()) for x in stacked]

    mb = MicroBatcher(run_batch, max_batch=16, max_wait_ms=50.0)
    try:
        futs = [mb.submit(np.full((2,), float(i))) for i in range(8)]
        release.set()
        results = [f.result(timeout=10.0) for f in futs]
        assert results == [2.0 * i for i in range(8)]
        # all 8 landed in at most 2 dispatches (first may race ahead
        # with fewer), and every dispatch size is a power-of-two bucket
        assert sum(calls) >= 8 and len(calls) <= 2
        for c in calls:
            assert c in (1, 2, 4, 8, 16)
    finally:
        mb.stop()


def test_batch_pads_to_bucket_and_orders_results():
    calls = []
    mb = MicroBatcher(_sum_runner(calls), max_batch=8, max_wait_ms=200.0)
    try:
        time.sleep(0.05)  # let the dispatcher block on an empty queue
        futs = [mb.submit(np.full((1,), float(i))) for i in range(3)]
        assert [f.result(timeout=10.0) for f in futs] == [0.0, 1.0, 2.0]
        assert 4 in calls  # 3 requests padded up to the 4-bucket
        assert mb.metrics.snapshot()["padded_items"] >= 1
    finally:
        mb.stop()


def test_runner_error_propagates_to_every_future():
    def run_batch(stacked):
        raise RuntimeError("boom")

    mb = MicroBatcher(run_batch, max_batch=4, max_wait_ms=20.0)
    try:
        futs = [mb.submit(np.zeros((1,))) for _ in range(3)]
        for f in futs:
            with pytest.raises(RuntimeError, match="boom"):
                f.result(timeout=10.0)
        assert mb.metrics.snapshot()["errors"] == 3
    finally:
        mb.stop()


def test_stop_rejects_new_and_fails_queued():
    started = threading.Event()
    block = threading.Event()

    def run_batch(stacked):
        started.set()
        block.wait(5.0)
        return [0.0] * stacked.shape[0]

    mb = MicroBatcher(run_batch, max_batch=1, max_wait_ms=1.0)
    f1 = mb.submit(np.zeros((1,)))
    assert started.wait(5.0)
    f2 = mb.submit(np.zeros((1,)))  # sits in the queue behind f1
    block.set()
    mb.stop()
    assert f1.result(timeout=10.0) == 0.0
    with pytest.raises(RuntimeError):
        mb.submit(np.zeros((1,)))
    # f2 either ran before the stop drained the queue or was failed
    if f2.exception(timeout=10.0) is not None:
        assert "stopped" in str(f2.exception())


def test_pipelined_batcher_overlaps_dispatch_with_materialize():
    """With dispatch/materialize split and pipeline_depth > 1, the
    dispatcher keeps issuing batches while earlier ones are still
    materializing — the property that hides host->device link latency
    (serve/engine.MicroBatcher pipelined mode)."""
    dispatched, released = [], threading.Event()

    def dispatch_batch(stacked):
        dispatched.append(time.monotonic())
        return [float(x.sum()) for x in stacked]

    def materialize(handle):
        released.wait(5.0)  # first batch's materialize blocks...
        return handle

    mb = MicroBatcher(dispatch_batch=dispatch_batch,
                      materialize=materialize, pipeline_depth=3,
                      max_batch=1, max_wait_ms=1.0)
    try:
        futs = [mb.submit(np.full((2,), i)) for i in range(3)]
        # ...yet all three batches get DISPATCHED while it blocks.
        deadline = time.monotonic() + 5.0
        while len(dispatched) < 3 and time.monotonic() < deadline:
            time.sleep(0.005)
        assert len(dispatched) == 3, dispatched
        released.set()
        assert [f.result(timeout=10.0) for f in futs] == [0.0, 2.0, 4.0]
    finally:
        released.set()
        mb.stop()


def test_pipelined_materialize_error_propagates():
    def dispatch_batch(stacked):
        return stacked

    def materialize(handle):
        raise ValueError("device exploded")

    mb = MicroBatcher(dispatch_batch=dispatch_batch,
                      materialize=materialize, pipeline_depth=2,
                      max_batch=4, max_wait_ms=1.0)
    try:
        f = mb.submit(np.zeros((1,)))
        with pytest.raises(ValueError, match="device exploded"):
            f.result(timeout=10.0)
        assert mb.metrics.snapshot()["errors"] == 1
    finally:
        mb.stop()


def test_pipelined_stop_resolves_inflight():
    """stop() materializes batches already dispatched before joining the
    completion thread — no future is left dangling."""
    n_dispatched = []

    def dispatch_batch(stacked):
        n_dispatched.append(1)
        return [float(x.sum()) for x in stacked]

    def materialize(handle):
        time.sleep(0.05)
        return handle

    mb = MicroBatcher(dispatch_batch=dispatch_batch,
                      materialize=materialize, pipeline_depth=4,
                      max_batch=1, max_wait_ms=1.0)
    futs = [mb.submit(np.full((1,), i)) for i in range(4)]
    deadline = time.monotonic() + 5.0
    while len(n_dispatched) < 4 and time.monotonic() < deadline:
        time.sleep(0.005)  # all 4 dispatched; some still materializing
    mb.stop()
    assert [f.result(timeout=1.0) for f in futs] == [0.0, 1.0, 2.0, 3.0]


def test_pipelined_requires_the_pair():
    with pytest.raises(ValueError):
        MicroBatcher(dispatch_batch=lambda x: x)  # no materialize
    with pytest.raises(ValueError):
        MicroBatcher(lambda x: x, pipeline_depth=2)  # blocking + depth


def test_metrics_snapshot_fields():
    m = ServeMetrics()
    m.record_batch(3, 4, [0.001, 0.002, 0.003])
    snap = m.snapshot()
    assert snap["requests"] == 3
    assert snap["batches"] == 1
    assert snap["padded_items"] == 1
    assert snap["batch_hist"] == {4: 1}
    assert snap["latency_ms"]["p50"] == pytest.approx(2.0, abs=0.5)


@pytest.fixture(scope="module")
def tiny_service():
    model_args = dict(image_size=(48, 48), dtype=jnp.float32)
    from hgr_tpu.models import MultiTaskNet

    model = MultiTaskNet(**model_args)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 48, 48, 3)), train=False)
    svc = ClassifierService(model, variables,
                            class_names={"fist": 2, "palm": 8},
                            max_batch=4, max_wait_ms=5.0)
    svc.warm()
    yield svc
    svc.stop()


def test_classifier_service_output_contract(tiny_service):
    crop = np.random.RandomState(0).randint(
        0, 255, (48, 48, 3), dtype=np.uint8)
    out = tiny_service.classify(crop, timeout=30.0)
    assert set(out) == {"label", "label_name", "probs", "landmarks"}
    assert out["probs"].shape == (19,)
    assert np.isclose(out["probs"].sum(), 1.0, atol=1e-3)
    assert out["landmarks"].shape == (21, 2)
    assert (out["landmarks"] >= 0).all() and (out["landmarks"] < 48).all()
    assert out["label"] == int(out["probs"].argmax())


def test_classifier_service_batches_match_direct_forward(tiny_service):
    rng = np.random.RandomState(1)
    crops = rng.randint(0, 255, (6, 48, 48, 3), dtype=np.uint8)
    futs = [tiny_service.submit(c) for c in crops]
    probs = np.stack([f.result(timeout=30.0)["probs"] for f in futs])
    # identical crops through different dispatches agree exactly
    again = np.stack([tiny_service.classify(c, timeout=30.0)["probs"]
                      for c in crops])
    np.testing.assert_allclose(probs, again, atol=1e-6)


def test_classifier_service_rejects_bad_shape(tiny_service):
    with pytest.raises(ValueError, match="expected"):
        tiny_service.submit(np.zeros((32, 32, 3), np.uint8))


def test_detector_service_full_frames():
    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.infer.detect import HandGesturePipeline
    from hgr_tpu.infer.weights import (
        load_classifier_weights,
        load_detector_weights,
    )
    from hgr_tpu.serve import DetectorService

    pipe = HandGesturePipeline(
        load_classifier_weights("", image_size=(64, 64)),
        load_detector_weights("", det_img_size=160),
        DEFAULT_NAMES, det_img_size=160, cls_img_size=(64, 64),
        score_thresh=-1.0, dtype=jnp.float32)
    svc = DetectorService(pipe, frame_hw=(180, 320), max_batch=4,
                          max_wait_ms=20.0)
    try:
        frames = np.random.RandomState(0).randint(
            0, 255, (3, 180, 320, 3), np.uint8)
        futs = [svc.submit(f) for f in frames]
        results = [f.result(timeout=120.0) for f in futs]
        direct = pipe.infer_frames(frames)
        for got, want in zip(results, direct):
            assert got["label"] == want["label"]
            np.testing.assert_array_equal(got["box"], want["box"])
        with pytest.raises(ValueError, match="expected"):
            svc.submit(np.zeros((64, 64, 3), np.uint8))
    finally:
        svc.stop()


def test_http_server_end_to_end(tiny_service):
    from cli.serve import make_handler
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(tiny_service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
            assert json.loads(r.read()) == {"ok": True}

        crop = np.random.RandomState(2).randint(
            0, 255, (48, 48, 3), dtype=np.uint8)
        buf = io.BytesIO()
        np.save(buf, crop)
        req = urllib.request.Request(f"{base}/classify", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        assert 0 <= body["label"] < 19
        assert len(body["probs"]) == 19
        assert len(body["landmarks"]) == 21
        # direct call agrees with the HTTP path
        direct = tiny_service.classify(crop, timeout=30.0)
        assert direct["label"] == body["label"]

        bad = urllib.request.Request(
            f"{base}/classify",
            data=b"not an npy", method="POST")
        try:
            urllib.request.urlopen(bad, timeout=10)
            raised = False
        except urllib.error.HTTPError as e:
            raised = True
            assert e.code in (400, 500)
        assert raised

        # a float-normalized crop must be a 400, not a confidently
        # classified all-zeros image (cli/serve.py dtype validation)
        fbuf = io.BytesIO()
        np.save(fbuf, crop.astype(np.float32) / 255.0)
        fbad = urllib.request.Request(f"{base}/classify",
                                      data=fbuf.getvalue(), method="POST")
        try:
            urllib.request.urlopen(fbad, timeout=10)
            f_raised = False
        except urllib.error.HTTPError as e:
            f_raised = True
            assert e.code == 400
            assert "uint8" in json.loads(e.read())["error"]
        assert f_raised
        # but integral-valued float pixels in [0, 255] are accepted
        ibuf = io.BytesIO()
        np.save(ibuf, crop.astype(np.float64))
        ireq = urllib.request.Request(f"{base}/classify",
                                      data=ibuf.getvalue(), method="POST")
        with urllib.request.urlopen(ireq, timeout=30) as r:
            assert json.loads(r.read())["label"] == body["label"]

        with urllib.request.urlopen(f"{base}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1 and "latency_ms" in stats
    finally:
        httpd.shutdown()
        thread.join(timeout=5.0)


def test_http_jpeg_body(tiny_service):
    """POST /classify with a JPEG body (production clients send JPEG, not
    .npy): sniffed by magic, decoded by the native runtime (cv2
    fallback), host-resized to the compiled geometry (cli/serve.py)."""
    cv2 = pytest.importorskip("cv2")
    from http.server import ThreadingHTTPServer

    from cli.serve import _decode_jpeg, _resize_host, make_handler

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(tiny_service))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    port = httpd.server_address[1]
    try:
        # deliberately NOT the model geometry: exercises the host resize
        img = np.random.RandomState(5).randint(
            0, 255, (64, 80, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/classify", data=enc.tobytes(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        assert 0 <= body["label"] < 19
        assert len(body["probs"]) == 19

        # the HTTP path == decode + resize + direct classify, exactly
        expect = _resize_host(_decode_jpeg(enc.tobytes()),
                              tiny_service.image_size)
        direct = tiny_service.classify(expect, timeout=30.0)
        assert direct["label"] == body["label"]
        np.testing.assert_allclose(
            np.asarray(direct["probs"]), np.asarray(body["probs"]),
            rtol=0, atol=1e-6)
    finally:
        httpd.shutdown()
        thread.join(timeout=5.0)


def test_http_detect_endpoint(tiny_service):
    """POST /detect runs the fused full-frame graph behind the batcher;
    /stats grows a 'detect' sub-object (cli/serve.py)."""
    import jax.numpy as jnp

    from cli.serve import make_handler
    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.infer.detect import HandGesturePipeline
    from hgr_tpu.infer.weights import (
        load_classifier_weights,
        load_detector_weights,
    )
    from hgr_tpu.serve import DetectorService
    from http.server import ThreadingHTTPServer

    pipe = HandGesturePipeline(
        load_classifier_weights("", image_size=(64, 64)),
        load_detector_weights("", det_img_size=160),
        DEFAULT_NAMES, det_img_size=160, cls_img_size=(64, 64),
        score_thresh=-1.0, dtype=jnp.float32)
    det = DetectorService(pipe, frame_hw=(180, 320), max_batch=2,
                          max_wait_ms=10.0)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(tiny_service, det))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        frame = np.random.RandomState(4).randint(
            0, 255, (180, 320, 3), dtype=np.uint8)
        buf = io.BytesIO()
        np.save(buf, frame)
        req = urllib.request.Request(f"{base}/detect", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            body = json.loads(r.read())
        d = body["detection"]
        assert d is not None  # score_thresh=-1 always passes the gate
        assert 0 <= d["label"] < 19 and len(d["box"]) == 4
        assert len(d["landmarks"]) == 21
        # HTTP path agrees with the direct fused graph
        direct = pipe.infer_frames(frame[None])[0]
        assert d["label"] == direct["label"]
        assert d["box"] == np.asarray(direct["box"], np.float64).tolist()

        # Off-geometry frames: host-resized for the device graph, but
        # the response coordinates map BACK to the client's original
        # geometry (2x here) — overlays draw on the frame the client
        # sent (cli/serve.py _to_client_space).
        cv2 = pytest.importorskip("cv2")
        big = cv2.resize(frame, (640, 360),
                         interpolation=cv2.INTER_LINEAR)
        buf2 = io.BytesIO()
        np.save(buf2, big)
        req2 = urllib.request.Request(
            f"{base}/detect", data=buf2.getvalue(), method="POST")
        with urllib.request.urlopen(req2, timeout=120) as r:
            d2 = json.loads(r.read())["detection"]
        # the server saw cv2.resize(big, (320, 180)) — not bit-equal to
        # `frame`, so compare against the direct result on that image
        small_again = cv2.resize(big, (320, 180),
                                 interpolation=cv2.INTER_LINEAR)
        direct2 = pipe.infer_frames(small_again[None])[0]
        np.testing.assert_allclose(
            np.asarray(d2["box"]),
            np.asarray(direct2["box"], np.float64) * 2.0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(d2["landmarks"]),
            np.asarray(direct2["landmarks"], np.float64) * 2.0, atol=1e-6)

        # wrong geometry is host-resized to the compiled frame_hw now
        # (cli/serve.py _read_image); a non-image body is still a 400
        bad_arr = io.BytesIO()
        np.save(bad_arr, np.zeros((4, 5), np.uint8))  # not (H, W, 3)
        bad = urllib.request.Request(
            f"{base}/detect", data=bad_arr.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        with urllib.request.urlopen(f"{base}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["detect"]["requests"] >= 1
    finally:
        httpd.shutdown()
        thread.join(timeout=5.0)
        det.stop()


def test_submit_many_aggregate_roundtrip():
    """submit_many resolves ONE future to the ordered list of per-item
    outputs; items still flow through the normal batching path."""
    calls = []
    mb = MicroBatcher(_sum_runner(calls), max_batch=8, max_wait_ms=50.0)
    try:
        fut = mb.submit_many([np.full((2,), float(i)) for i in range(5)])
        assert fut.result(timeout=10.0) == [2.0 * i for i in range(5)]
        assert mb.metrics.snapshot()["requests"] == 5
        assert mb.submit_many([]).result(timeout=1.0) == []
    finally:
        mb.stop()


def test_submit_many_mixes_with_submit_in_one_batch():
    """Window items and plain submits share a dispatch (cross-client
    micro-batching is unchanged by bulk submission)."""
    calls = []
    release = threading.Event()

    def run_batch(stacked):
        release.wait(5.0)
        calls.append(stacked.shape[0])
        return [float(x.sum()) for x in stacked]

    mb = MicroBatcher(run_batch, max_batch=16, max_wait_ms=50.0)
    try:
        f_single = mb.submit(np.full((2,), 10.0))
        f_bulk = mb.submit_many([np.full((2,), float(i))
                                 for i in range(4)])
        release.set()
        assert f_single.result(timeout=10.0) == 20.0
        assert f_bulk.result(timeout=10.0) == [0.0, 2.0, 4.0, 6.0]
        assert len(calls) <= 2  # shared dispatches, not 5 singles
    finally:
        mb.stop()


def test_submit_many_error_wins_once():
    """A runner error fails the aggregate exactly once with the batch's
    exception (first error wins; no hang on partial completion)."""
    def run_batch(stacked):
        raise RuntimeError("boom")

    mb = MicroBatcher(run_batch, max_batch=4, max_wait_ms=20.0)
    try:
        fut = mb.submit_many([np.zeros((1,)) for _ in range(6)])  # 2 batches
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=10.0)
    finally:
        mb.stop()


def test_submit_many_after_stop_raises():
    mb = MicroBatcher(lambda s: [0.0] * s.shape[0], max_batch=4)
    mb.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        mb.submit_many([np.zeros((1,))])


def test_hard_stop_unwedges_blocked_dispatcher():
    """Shutdown race fix (ADVICE r4): a dispatcher blocked on a FULL
    _inflight queue (completer stuck inside materialize) must not leak
    when stop() times out on its join — the hard-stop path fails the
    blocked batch's futures and stop() returns in bounded time."""
    release = threading.Event()
    dispatched = threading.Event()

    def dispatch_batch(stacked):
        dispatched.set()
        return stacked

    def materialize(handle):
        release.wait(20.0)  # completer wedges here holding depth=1 slot
        return [float(x.sum()) for x in handle]

    mb = MicroBatcher(dispatch_batch=dispatch_batch,
                      materialize=materialize, pipeline_depth=1,
                      max_batch=2, max_wait_ms=1.0)
    # batch 1 occupies the single in-flight slot (completer blocks in
    # materialize); batch 2 dispatches, then its _inflight.put blocks
    f1 = mb.submit(np.full((2,), 1.0))
    assert dispatched.wait(5.0)
    dispatched.clear()
    f2 = mb.submit(np.full((2,), 2.0))
    assert dispatched.wait(5.0)  # second dispatch happened -> put blocks
    t0 = time.monotonic()
    mb.stop(timeout=0.5)
    assert time.monotonic() - t0 < 5.0  # bounded, no join-forever
    # the wedged batch's futures fail rather than hang forever
    with pytest.raises(RuntimeError, match="stopped"):
        f2.result(timeout=10.0)
    release.set()  # let the completer finish; f1 resolves or fails,
    # but must not hang
    f1.exception(timeout=10.0)
