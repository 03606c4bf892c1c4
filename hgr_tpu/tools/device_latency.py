"""Tunnel-free DEVICE latency of the fused detect->classify graph.

BASELINE.json names "p50 detect->classify latency" as a tracked metric,
but every small-batch wall-clock number recorded through the axon tunnel
carries ~25-30 ms of RPC round-trip (BENCH_LOG round-2 caveat), and
per-op device traces are unavailable through the tunnel. This tool
measures the on-device graph time directly with a chained-scan slope:

  T(K) = overhead + K * t_device

where T(K) is the wall time of ONE dispatch that runs the full fused
graph K times back-to-back inside a single jit (lax.scan, with a real
data dependence between iterations so XLA cannot elide or overlap
them). The slope between two K values cancels the constant
dispatch+RTT+sync overhead exactly, leaving the pure device time per
frame — the number a PCIe-attached host would see.

The inter-iteration dependence is a conditional +1 on one pixel, gated
on a predicate that is always false at runtime (score > 1e9) but
opaque to the compiler, so iteration i+1's input depends on iteration
i's output without changing the computation.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frame_h", type=int, default=480)
    p.add_argument("--frame_w", type=int, default=640)
    p.add_argument("--k_small", type=int, default=4)
    p.add_argument("--k_large", type=int, default=32)
    p.add_argument("--iters", type=int, default=15)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import DEFAULT_NAMES
    from hgr_tpu.infer.detect import HandGesturePipeline
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.models.yolo import YOLOv7Tiny

    print(f"platform={jax.devices()[0].platform}")

    cls_model = MultiTaskNet()
    cls_vars = cls_model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 192, 192, 3)), train=False)
    det_model = YOLOv7Tiny(num_classes=1)
    det_vars = det_model.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 416, 416, 3)), train=False)
    pipe = HandGesturePipeline(cls_vars, det_vars, DEFAULT_NAMES)

    graph = pipe._build_graph(args.frame_h, args.frame_w)

    def make_chained(k: int):
        @jax.jit
        def chained(frame_u8):
            def body(frame, _):
                labels, scores, boxes, lm = graph(frame)
                # opaque-false predicate: real dependence, no-op at runtime
                bump = (scores[0] > 1e9).astype(frame.dtype)
                frame = frame.at[0, 0, 0, 0].add(bump)
                return frame, (labels[0], scores[0])
            _, outs = jax.lax.scan(body, frame_u8, None, length=k)
            return outs
        return chained

    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.randint(
        0, 255, (1, args.frame_h, args.frame_w, 3)).astype(np.uint8))

    def timed(fn):
        out = fn(frame)
        float(jnp.sum(out[1]))  # sync (block_until_ready no-ops on axon)
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            out = fn(frame)
            float(jnp.sum(out[1]))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    f_small = make_chained(args.k_small)
    f_large = make_chained(args.k_large)
    t_small = timed(f_small)
    t_large = timed(f_large)
    per_frame = (t_large - t_small) / (args.k_large - args.k_small)
    overhead = t_small - args.k_small * per_frame
    print(f"T(K={args.k_small}) = {t_small * 1e3:.1f} ms, "
          f"T(K={args.k_large}) = {t_large * 1e3:.1f} ms")
    print(f"device detect->classify latency: {per_frame * 1e3:.2f} ms/frame "
          f"({1.0 / per_frame:.0f} fps device-side); "
          f"dispatch+tunnel overhead: {overhead * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
