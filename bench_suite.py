"""Benchmark suite covering the five BASELINE.json configs.

Prints one JSON line per config. ``bench.py`` remains the single-line
headline benchmark the driver consumes; this suite is for broader
tracking:

  1. single 192x192 crop forward (bs=1 latency)
  2. batch-32 inference (logits + heatmap decode)
  3. train step (device augment -> joint loss -> AdamW update)
  4. end-to-end frame: detect -> crop -> classify (random det weights)
  5. data-parallel train step on the available mesh (all local devices)
  6. augment+forward (the deployed/train INPUT path: uint8 canvas ->
     fused jitter+warp+normalize -> 2-output forward) at large batch
  7. warp-kernel canvas staging dtype comparison (f32/bf16/u8 HBM reads)
  8. full-model forward INCLUDING the attention map output at B 512 and
     4096 (the 3-output debug forward: layers 1..3 ride the fused
     no-map Pallas attention, the last layer keeps the XLA chain that
     materializes the map — see BENCH_LOG.md round 2b for the kernel's
     win-or-die history)

Usage: python bench_suite.py [--iters 20] [--configs 1,...,8]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _sync(out):
    """Force a real device sync: pull one scalar to host.

    jax.block_until_ready is a no-op for remote-tunneled device arrays in
    some environments (observed on the axon platform) — a host transfer
    is the only reliable barrier.
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf).astype(jnp.float32))


def _timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--configs", type=str, default="1,2,3,4,5")
    parser.add_argument("--train_batch", type=int, default=256)
    parser.add_argument("--aug_batch", type=int, default=2048)
    args = parser.parse_args()
    configs = {int(c) for c in args.configs.split(",")}

    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import AugmentConfig
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.models.multitasknet import heatmaps_to_nchw
    from hgr_tpu.ops.heatmap import get_max_preds

    dev = str(jax.devices()[0])
    model = MultiTaskNet(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)), train=False)
    rng = np.random.RandomState(0)

    def emit(name, value, unit, **extra):
        print(json.dumps({"metric": name, "value": round(value, 3),
                          "unit": unit, "device": dev, **extra}))

    if 1 in configs:
        @jax.jit
        def f1(x):
            l, h, _ = model.apply(variables, x, train=False,
                                  need_attnmap=False)
            return l, h

        x1 = jnp.asarray(rng.randn(1, 192, 192, 3), jnp.bfloat16)
        med = _timeit(f1, x1, iters=args.iters)
        emit("single-crop fwd latency", med * 1e3, "ms")

    if 2 in configs:
        @jax.jit
        def f2(x):
            l, h, _ = model.apply(variables, x, train=False,
                                  need_attnmap=False)
            preds, maxv = get_max_preds(heatmaps_to_nchw(h))
            return jnp.argmax(l, -1), preds

        x2 = jnp.asarray(rng.randn(32, 192, 192, 3), jnp.bfloat16)
        med = _timeit(f2, x2, iters=args.iters)
        emit("batch-32 inference (logits+pose decode)", 32 / med, "crops/s",
             latency_ms=round(med * 1e3, 3))

    if 3 in configs:
        from hgr_tpu.train.state import create_train_state
        from hgr_tpu.train.steps import make_train_step

        state, _ = create_train_state(
            model, jax.random.PRNGKey(0), (1, 192, 192, 3), lr=1e-3,
            milestones_steps=(10**6,))
        step = make_train_step(AugmentConfig())
        B, S = args.train_batch, 256
        batch = {
            "canvas": jnp.asarray(rng.randint(0, 255, (B, S, S, 3)),
                                  jnp.uint8),
            "orig_to_canvas": jnp.tile(
                jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (B, 1, 1)),
            "sizes_hw": jnp.full((B, 2), float(S)),
            "joints": jnp.asarray(rng.rand(B, 21, 2) * S, jnp.float32),
            "joints_vis": jnp.ones((B, 21)),
            "label": jnp.asarray(rng.randint(0, 19, (B,)), jnp.int32),
        }
        key = jax.random.PRNGKey(0)

        def f3(state, batch, key):
            s, m = step(state, batch, key)
            return m["total_loss"]

        # NB: donation means state must thread through; time via closure
        times = []
        s = state
        for _ in range(3):
            s, m = step(s, batch, key)
        _sync(m["total_loss"])
        for _ in range(args.iters):
            t0 = time.perf_counter()
            s, m = step(s, batch, key)
            _sync(m["total_loss"])
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        emit("train step (augment+fwd+bwd+AdamW)", B / med, "crops/s",
             batch=B, step_ms=round(med * 1e3, 3))

    if 4 in configs:
        from hgr_tpu.config import DEFAULT_NAMES
        from hgr_tpu.infer.detect import HandGesturePipeline
        from hgr_tpu.infer.weights import load_detector_weights

        pipe = HandGesturePipeline(
            variables, load_detector_weights(""), DEFAULT_NAMES,
            score_thresh=-1.0)
        frame = rng.randint(0, 255, (1, 360, 640, 3)).astype(np.uint8)
        fn = pipe._compiled(360, 640, 1)
        med = _timeit(fn, jnp.asarray(frame), iters=args.iters)
        emit("e2e frame detect->crop->classify p50", med * 1e3, "ms",
             fps=round(1 / med, 1))

        frames16 = rng.randint(0, 255, (16, 360, 640, 3)).astype(np.uint8)
        fn16 = pipe._compiled(360, 640, 16)
        med16 = _timeit(fn16, jnp.asarray(frames16), iters=args.iters)
        emit("e2e batched-16 video throughput", 16 / med16, "frames/s",
             batch_ms=round(med16 * 1e3, 3))

    if 5 in configs:
        from hgr_tpu.parallel.mesh import make_mesh, shard_batch
        from hgr_tpu.parallel.steps import (
            make_parallel_train_step,
            shard_state,
        )
        from hgr_tpu.train.state import create_train_state

        n = len(jax.devices())
        if n < 2:
            emit("data-parallel train step", -1, "crops/s",
                 note=f"only {n} device(s); skipped")
        else:
            mesh = make_mesh({"data": n})
            state, _ = create_train_state(
                model, jax.random.PRNGKey(0), (1, 192, 192, 3), lr=1e-3,
                milestones_steps=(10**6,))
            state = shard_state(state, mesh)
            pstep = make_parallel_train_step(mesh, AugmentConfig(), state)
            B, S = 64 * n, 256
            host = {
                "canvas": rng.randint(0, 255, (B, S, S, 3)).astype(np.uint8),
                "orig_to_canvas": np.tile(
                    np.asarray([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
                    (B, 1, 1)),
                "sizes_hw": np.full((B, 2), float(S), np.float32),
                "joints": (rng.rand(B, 21, 2) * S).astype(np.float32),
                "joints_vis": np.ones((B, 21), np.float32),
                "label": rng.randint(0, 19, (B,)).astype(np.int32),
            }
            with mesh:
                sb = shard_batch(host, mesh)
                key = jax.device_put(
                    jax.random.PRNGKey(0),
                    jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec()))
                s = state
                for _ in range(3):
                    s, m = pstep(s, sb, key)
                _sync(m["total_loss"])
                times = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    s, m = pstep(s, sb, key)
                    _sync(m["total_loss"])
                    times.append(time.perf_counter() - t0)
            med = float(np.median(times))
            emit("data-parallel train step", B / med, "crops/s",
                 devices=n, global_batch=B, step_ms=round(med * 1e3, 3))

    if 6 in configs:
        from hgr_tpu.data.pipeline import (
            apply_augment_batch,
            draw_augment_params,
        )

        B, S = args.aug_batch, 256
        batch6 = {
            "canvas": jnp.asarray(rng.randint(0, 255, (B, S, S, 3)),
                                  jnp.uint8),
            "orig_to_canvas": jnp.tile(
                jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (B, 1, 1)),
            "sizes_hw": jnp.full((B, 2), float(S)),
            "joints": jnp.asarray(rng.rand(B, 21, 2) * S, jnp.float32),
            "joints_vis": jnp.ones((B, 21)),
        }
        aug = AugmentConfig()

        @jax.jit
        def f6(batch, key):
            params = draw_augment_params(key, B, batch["sizes_hw"], aug)
            data = apply_augment_batch(
                batch["canvas"], batch["orig_to_canvas"],
                batch["sizes_hw"], batch["joints"], batch["joints_vis"],
                params)
            l, h, _ = model.apply(variables, data["image"], train=False,
                                  need_attnmap=False)
            return l, h, data["target"]

        key6 = jax.random.PRNGKey(1)
        med = _timeit(f6, batch6, key6, iters=args.iters)
        emit("e2e input path (u8 canvas->augment->fwd)", B / med,
             "crops/s", batch=B, step_ms=round(med * 1e3, 3))

    if 7 in configs:
        from hgr_tpu.ops.warp_pallas import warp_twopass_pallas

        B, S = 512, 256
        canvas7 = jnp.asarray(rng.randint(0, 255, (B, S, S, 3)), jnp.uint8)
        theta = 0.3
        m7 = jnp.tile(jnp.asarray(
            [[np.cos(theta), -np.sin(theta), 40.0],
             [np.sin(theta), np.cos(theta), 10.0]], np.float32),
            (B, 1, 1))
        gains = jnp.ones((B, 3)) * 1.1
        dj = jnp.ones((B,))
        for dt in ("float32", "bfloat16", "uint8", "packed"):
            try:
                fn = jax.jit(functools.partial(
                    warp_twopass_pallas, out_size=(192, 192),
                    jitter_gains=gains, do_jitter=dj, canvas_dtype=dt))
                med = _timeit(fn, canvas7, m7, iters=args.iters)
                emit(f"warp kernel canvas_dtype={dt}", B / med, "crops/s",
                     batch=B, ms=round(med * 1e3, 3))
            except Exception as e:  # noqa: BLE001 — probing toolchain
                emit(f"warp kernel canvas_dtype={dt}", -1, "crops/s",
                     error=str(e)[:160])

    if 8 in configs:
        for B in (512, 4096):
            x8 = jnp.asarray(rng.randn(B, 192, 192, 3), jnp.bfloat16)

            @jax.jit
            def f8(x):
                l, h, a = model.apply(variables, x, train=False)
                return l, h, a

            med = _timeit(f8, x8, iters=args.iters)
            emit(f"fwd+attnmap B={B}", B / med, "crops/s",
                 ms=round(med * 1e3, 3))


if __name__ == "__main__":
    main()
