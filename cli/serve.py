"""Serve the gesture classifier over HTTP with dynamic micro-batching.

Beyond-reference capability (the reference's inference surface is the
frame-serial detect.py script). Endpoints:

  POST /classify   body = .npy bytes of a (H, W, 3) uint8 BGR crop at
                   the model image size; response = JSON
                   {label, label_name, probs, landmarks}
  GET  /stats      serving metrics (latency percentiles, batch sizes)
  GET  /healthz    liveness

Usage:
  python cli/serve.py --ckpt runs/exp/ckpt_best --data configs/hagrid.yaml \
      [--quantize calib.npy] [--port 8000] [--max_batch 64] [--max_wait_ms 5]

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


def build_service(args):
    import jax.numpy as jnp

    from hgr_tpu.config import IMAGENET_MEAN, IMAGENET_STD, load_data_config
    from hgr_tpu.infer.weights import load_classifier_weights
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.serve import ClassifierService

    data_cfg = load_data_config(args.data)
    model = MultiTaskNet(
        num_joints=data_cfg.num_joints,
        num_classes=data_cfg.num_classes,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    variables = load_classifier_weights(args.ckpt)
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
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
    service.warm()
    return service


def make_handler(service):
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
                self._send(200, service.metrics.snapshot())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/classify":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                crop = np.load(io.BytesIO(self.rfile.read(length)),
                               allow_pickle=False)
                result = service.classify(crop.astype(np.uint8),
                                          timeout=30.0)
                self._send(200, {
                    "label": result["label"],
                    "label_name": result["label_name"],
                    "probs": np.asarray(result["probs"]).tolist(),
                    "landmarks": np.asarray(result["landmarks"]).tolist(),
                })
            except ValueError as exc:
                self._send(400, {"error": str(exc)})
            except Exception as exc:  # noqa: BLE001 — report, don't crash
                self._send(500, {"error": str(exc)})

    return Handler


def serve_forever(service, host: str, port: int):
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"serving on http://{host}:{httpd.server_address[1]}  "
          f"(POST /classify, GET /stats)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        service.stop()
    return httpd


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    ap.add_argument("--data", default="configs/hagrid.yaml")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--quantize", default=None,
                    help=".npy/.npz of uint8 calibration crops -> int8 "
                         "backbone")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max_batch", type=int, default=64)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    args = ap.parse_args(argv)
    service = build_service(args)
    serve_forever(service, args.host, args.port)


if __name__ == "__main__":
    main()
