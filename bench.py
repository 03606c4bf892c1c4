"""Headline benchmark: HaGRID 192x192 crops/sec/chip (classify + pose).

Default measures the honest END-TO-END input path on the accelerator:
uint8 staged canvas -> fused HSV-jitter + affine warp (Pallas) ->
ImageNet normalize -> 2-output MultiTaskNet forward (bf16), B=4096 —
and prints ONE JSON line. ``--forward-only`` measures the pure forward
on preformed bf16 tensors (B=4096; 15.4k crops/s on v5e, BENCH_LOG.md
round 2b). ``vs_baseline`` is relative to the reference implementation measured
in this sandbox (torch CPU bs=32: 14.0 crops/s — BASELINE.md; the
reference publishes no numbers of its own).

Usage: python bench.py [--batch N] [--iters 30] [--forward-only]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

REFERENCE_CROPS_PER_SEC = 14.0  # BASELINE.md [measured], torch CPU bs=32


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--forward-only", action="store_true",
                        help="benchmark the pure 2-output forward on "
                             "preformed bf16 tensors instead of the "
                             "default end-to-end input path")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    dev = jax.devices()[0]
    model = MultiTaskNet(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)), train=False)

    args.include_augment = not args.forward_only
    if args.include_augment:
        from hgr_tpu.config import AugmentConfig
        from hgr_tpu.data.pipeline import apply_augment_batch, draw_augment_params

        cfg = AugmentConfig()
        canvas = 256

        @jax.jit
        def fn(canvas_u8, a, sizes, joints, vis, key):
            params = draw_augment_params(key, canvas_u8.shape[0], sizes, cfg)
            data = apply_augment_batch(canvas_u8, a, sizes, joints, vis,
                                       params)
            return model.apply(variables, data["image"], train=False,
                               need_attnmap=False)

        rng = np.random.RandomState(0)
        b = args.batch
        inputs = (
            jnp.asarray(rng.randint(0, 255, (b, canvas, canvas, 3)),
                        jnp.uint8),
            jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (b, 1, 1)),
            jnp.full((b, 2), float(canvas)),
            jnp.asarray(rng.rand(b, 21, 2) * canvas, jnp.float32),
            jnp.ones((b, 21)),
            jax.random.PRNGKey(0),
        )
        run = lambda: fn(*inputs)
        metric_name = "e2e u8->augment->classify+pose crops/sec/chip @192x192"
    else:
        # Deployed 2-output forward (the reference's exported graph also
        # drops the attention map, export.py:43-45), bf16 activations.
        @jax.jit
        def fwd(x):
            logits, hmap, _ = model.apply(variables, x, train=False,
                                          need_attnmap=False)
            return logits, hmap

        x = jnp.asarray(
            np.random.RandomState(0).randn(args.batch, 192, 192, 3),
            jnp.bfloat16)
        run = lambda: fwd(x)
        metric_name = "classify+pose crops/sec/chip @192x192"

    def sync(out):
        # jax.block_until_ready is a no-op for remote-tunneled arrays in
        # some environments (axon); a scalar host transfer is a reliable
        # barrier.
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf).astype(jnp.float32))

    # Warmup (compile)
    for _ in range(args.warmup):
        out = run()
    sync(out)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = run()
        sync(out)
        times.append(time.perf_counter() - t0)

    med = float(np.median(times))
    crops_per_sec = args.batch / med
    result = {
        "metric": metric_name,
        "value": round(crops_per_sec, 1),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / REFERENCE_CROPS_PER_SEC, 2),
        "batch": args.batch,
        "median_step_ms": round(med * 1e3, 3),
        "device": str(dev),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
