"""Serve the gesture classifier over HTTP with dynamic micro-batching.

Beyond-reference capability (the reference's inference surface is the
frame-serial detect.py script). Endpoints:

  POST /classify   body = a JPEG (sniffed by magic bytes; decoded by the
                   first-party native decoder, cv2 fallback) or .npy
                   bytes of a (H, W, 3) uint8 BGR crop; resized host-side
                   to the model image size when needed; response = JSON
                   {label, label_name, probs, landmarks}. Coordinates
                   (landmarks, and /detect's box) are ALWAYS in the
                   client's original image geometry — the host resize is
                   undone before responding, so overlays draw directly
                   on the frame the client sent.
  POST /detect     (with --det_weight) body = a JPEG or .npy of a uint8
                   BGR FULL FRAME (resized to --frame_hw when needed);
                   runs the fused detect->crop->classify graph
                   (infer/detect.py); response = JSON {detection:
                   {label, label_name, score, box, landmarks} | null}
                   (null = the score gate failed, reference detect.py:140)
  GET  /stats      serving metrics (latency percentiles, batch sizes;
                   a "detect" sub-object when /detect is enabled)
  GET  /healthz    liveness

Usage:
  python cli/serve.py --ckpt runs/exp/ckpt_best --data configs/hagrid.yaml \
      [--quantize calib.npy] [--det_weight det.npz --frame_hw 360 640] \
      [--port 8000] [--max_batch 64] [--max_wait_ms 5]

``--quantize`` takes a .npy/.npz of calibration crops (N, H, W, 3)
uint8; the GELAN backbone then serves int8 (infer/quant.py).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _decode_jpeg(body: bytes) -> np.ndarray:
    """JPEG bytes -> BGR uint8 via the native runtime, cv2 fallback."""
    from hgr_tpu.data import native

    img = native.decode_jpeg_bgr_bytes(body)
    if img is not None:
        return img
    try:
        import cv2
    except ImportError as exc:
        raise ValueError(
            "JPEG body but neither the native decoder nor cv2 is "
            "available") from exc
    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("undecodable JPEG body")
    return img


def _resize_host(img: np.ndarray, target_hw) -> np.ndarray:
    """Host-side INTER_LINEAR resize to the server's compiled geometry."""
    try:
        import cv2
    except ImportError as exc:
        raise ValueError(
            f"image is {img.shape[:2]} but this server is compiled for "
            f"{tuple(target_hw)} and cv2 is unavailable for host resize; "
            "send the exact geometry") from exc
    h, w = target_hw
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)


def build_service(args):
    import jax.numpy as jnp

    from hgr_tpu.config import IMAGENET_MEAN, IMAGENET_STD, load_data_config
    from hgr_tpu.infer.weights import (
        infer_backbone_variant,
        load_classifier_weights,
        resolve_image_size,
    )
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.serve import ClassifierService

    data_cfg = load_data_config(args.data)
    image_size = resolve_image_size(args.ckpt, args.image_size)
    args.image_size = list(image_size)  # detector service reuses it
    backbone = {"auto": "auto", "gelans": "small",
                "gelanl": "large"}[args.backbone]
    variables = load_classifier_weights(args.ckpt, image_size,
                                        backbone=backbone)
    model = MultiTaskNet(
        num_joints=data_cfg.num_joints,
        num_classes=data_cfg.num_classes,
        image_size=image_size,
        backbone=infer_backbone_variant(variables),
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    if args.quantize:
        from hgr_tpu.infer.quant import quantize_model

        crops = np.load(args.quantize)
        if hasattr(crops, "files"):  # npz
            crops = crops[crops.files[0]]
        mean = np.asarray(IMAGENET_MEAN, np.float32)
        std = np.asarray(IMAGENET_STD, np.float32)
        batches = [
            ((crops[i:i + 64].astype(np.float32) / 255.0) - mean) / std
            for i in range(0, len(crops), 64)
        ]
        variables = quantize_model(model, variables, batches,
                                   need_attnmap=False)
        print(f"quantized backbone from {len(crops)} calibration crops")
    service = ClassifierService(
        model, variables, class_names=data_cfg.names,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        pipeline_depth=args.pipeline_depth)
    service.warm()
    return service, variables


def build_detector_service(args, cls_variables):
    """Full-frame service around the fused detect->crop->classify graph
    (one compiled geometry per instance, serve/engine.py). Reuses the
    classifier variables build_service already loaded — including the
    int8 'quant' collection under --quantize, so /detect serves the
    same quantized backbone as /classify."""
    import jax.numpy as jnp

    from hgr_tpu.config import load_data_config
    from hgr_tpu.infer.detect import HandGesturePipeline
    from hgr_tpu.infer.weights import load_detector_weights
    from hgr_tpu.serve import DetectorService

    data_cfg = load_data_config(args.data)
    pipeline = HandGesturePipeline(
        cls_variables,
        load_detector_weights(args.det_weight),
        data_cfg.names,
        cls_img_size=tuple(args.image_size),
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32)
    service = DetectorService(
        pipeline, frame_hw=tuple(args.frame_hw),
        max_batch=args.det_max_batch, max_wait_ms=args.max_wait_ms)
    service.warm()
    return service


def make_handler(service, detector=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet per-request stderr lines
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            elif self.path == "/stats":
                stats = service.metrics.snapshot()
                if detector is not None:
                    stats["detect"] = detector.metrics.snapshot()
                self._send(200, stats)
            else:
                self._send(404, {"error": "unknown path"})

        def _read_image(self, target_hw):
            """Read the request body as a (H, W, 3) uint8 BGR image.

            JPEG bodies (sniffed by the FF D8 FF magic) decode through
            the native libjpeg runtime (data/native.py) with a cv2
            fallback; anything else is treated as .npy. Images whose
            geometry differs from ``target_hw`` are resized host-side
            (INTER_LINEAR) — the device graphs are compiled for one
            geometry per server.
            """
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            if body[:3] == b"\xff\xd8\xff":
                img = _decode_jpeg(body)
            else:
                img = np.load(io.BytesIO(body), allow_pickle=False)
            img = np.asarray(img)
            if img.ndim != 3 or img.shape[-1] != 3:
                raise ValueError(
                    f"expected (H, W, 3) image, got shape {img.shape}")
            if img.dtype != np.uint8:
                # A float-normalized crop astype'd to uint8 would be
                # all 0s/1s (and wide ints wrap mod 256) — classified
                # noise with a confident 200. Accept only values that
                # ARE uint8 pixels; reject everything else as a 400.
                if img.size == 0 or img.min() < 0 or img.max() > 255 or (
                        np.issubdtype(img.dtype, np.floating)
                        and not np.array_equal(img, np.round(img))):
                    raise ValueError(
                        f"expected uint8 pixels in [0, 255], got dtype "
                        f"{img.dtype} (float images must be sent as "
                        "uint8, not normalized floats)")
            orig_hw = (int(img.shape[0]), int(img.shape[1]))
            if orig_hw != tuple(target_hw):
                img = _resize_host(img.astype(np.uint8), target_hw)
            return img.astype(np.uint8), orig_hw

        @staticmethod
        def _to_client_space(pts, compiled_hw, orig_hw):
            """Map (..., 2) x,y coordinates (or a flat x0,y0,x1,y1 box)
            from the server's compiled geometry back to the client's
            ORIGINAL image geometry, undoing the host resize — clients
            draw overlays on the frame they sent, not on the server's
            internal one."""
            pts = np.asarray(pts, np.float64)
            sx = orig_hw[1] / compiled_hw[1]
            sy = orig_hw[0] / compiled_hw[0]
            if pts.ndim == 1:  # box [x0, y0, x1, y1]
                return (pts * np.array([sx, sy, sx, sy])).tolist()
            out = pts.copy()
            out[..., 0] *= sx
            out[..., 1] *= sy
            return out.tolist()

        def do_POST(self):
            try:
                if self.path == "/classify":
                    img, orig_hw = self._read_image(service.image_size)
                    result = service.classify(img, timeout=30.0)
                    self._send(200, {
                        "label": result["label"],
                        "label_name": result["label_name"],
                        "probs": np.asarray(result["probs"]).tolist(),
                        "landmarks": self._to_client_space(
                            result["landmarks"], service.image_size,
                            orig_hw),
                    })
                elif self.path == "/detect" and detector is not None:
                    img, orig_hw = self._read_image(detector.frame_hw)
                    result = detector.detect(img, timeout=30.0)
                    if result is None:
                        self._send(200, {"detection": None})
                    else:
                        self._send(200, {"detection": {
                            "label": result["label"],
                            "label_name": result["label_name"],
                            "score": result["score"],
                            "box": self._to_client_space(
                                np.asarray(result["box"]).reshape(-1),
                                detector.frame_hw, orig_hw),
                            "landmarks": self._to_client_space(
                                result["landmarks"], detector.frame_hw,
                                orig_hw),
                        }})
                else:
                    self._send(404, {"error": "unknown path"})
            except (ValueError, EOFError) as exc:
                # EOFError: np.load on an empty/truncated body — client
                # input errors, not server faults
                self._send(400, {"error": str(exc)})
            except Exception as exc:  # noqa: BLE001 — report, don't crash
                self._send(500, {"error": str(exc)})

    return Handler


def serve_forever(service, host: str, port: int, detector=None):
    httpd = ThreadingHTTPServer((host, port),
                                make_handler(service, detector))
    eps = "POST /classify" + (", POST /detect" if detector else "")
    print(f"serving on http://{host}:{httpd.server_address[1]}  "
          f"({eps}, GET /stats)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        service.stop()
        if detector is not None:
            detector.stop()
    return httpd


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    ap.add_argument("--data", default="configs/hagrid.yaml")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--backbone", default="auto",
                    choices=["auto", "gelans", "gelanl"],
                    help="GELAN variant of the checkpoint; auto detects "
                         "it from the weight tree (a mismatch would "
                         "serve silently wrong results — the variants "
                         "differ only in blocks-per-chain)")
    ap.add_argument("--image_size", nargs=2, type=int, default=None,
                    help="crop geometry the checkpoint was trained at; "
                         "default: the checkpoint's recorded "
                         "run_meta.json, else 192 192")
    ap.add_argument("--quantize", default=None,
                    help=".npy/.npz of uint8 calibration crops -> int8 "
                         "backbone")
    ap.add_argument("--det_weight", default=None,
                    help="detector weights (.npz / reference .onnx) — "
                         "enables POST /detect for full frames")
    ap.add_argument("--frame_hw", nargs=2, type=int, default=[360, 640],
                    help="full-frame geometry for /detect (one compiled "
                         "geometry per server, serve/engine.py)")
    ap.add_argument("--det_max_batch", type=int, default=16)
    ap.add_argument("--host_device_count", type=int, default=0,
                    metavar="N",
                    help="run on N virtual CPU devices instead of the "
                         "TPU (tests/CI; same flag as cli/train.py)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch", type=int, default=64)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--pipeline_depth", type=int, default=4,
                    help="classifier batches kept in flight on the device; "
                         ">1 overlaps host->device link latency with "
                         "device compute (see serve/engine.MicroBatcher)")
    args = ap.parse_args(argv)
    from hgr_tpu.utils.platform import force_host_cpu

    force_host_cpu(args.host_device_count)
    service, cls_variables = build_service(args)
    detector = (build_detector_service(args, cls_variables)
                if args.det_weight is not None else None)
    serve_forever(service, args.host, args.port, detector)


if __name__ == "__main__":
    main()
