"""Real-chip TP step cost (VERDICT r3 #5).

Round 3 proved the head-sharded split-operand attention kernel's
NUMERICS on the real chip (tools/split_attention_realchip.py) but its
cost story stayed a CPU-proxy upper bound that routed the kernel through
its XLA fallback — "an upper bound that cannot see its own feature".
One real chip cannot run a genuine TP=2 step, so this tool measures the
two halves a TP=2 device's step is made of, on real silicon:

(a) step-level: the {data:1, model:1} tensor-parallel program
    (make_parallel_train_step, fused_attention='split', GSPMD through
    the real compiler, split Mosaic kernel ACTIVE) vs the packed-DP
    {data:1} step at matched batch — the TP program-shape overhead with
    zero communication;
(b) kernel-level: the split fused-attention core at the exact LOCAL
    head-group shape a TP=2 device runs (heads=4, inner=128) vs the
    full packed 8-head kernel at matched token count — the per-layer
    compute each TP=2 device would pay, slope-timed (chained scan
    cancels dispatch overhead).

A real TP=2 step = (b)'s local kernels + per-layer collectives over ICI
(not measurable with one chip; the CPU-proxy collective structure is in
BENCH_LOG "TP vs DP step cost"). Usage:
  python -m hgr_tpu.tools.tp_realchip [--batch 512] [--steps 5]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np


def step_level(batch, image, canvas, steps):
    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import AugmentConfig
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.parallel.mesh import make_mesh, shard_batch
    from hgr_tpu.parallel.steps import make_parallel_train_step, shard_state
    from hgr_tpu.train.state import create_train_state

    rng = np.random.RandomState(0)
    host_batch = {
        "canvas": rng.randint(0, 255, (batch, canvas, canvas, 3)).astype(
            np.uint8),
        "orig_to_canvas": np.tile(
            np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32),
            (batch, 1, 1)),
        "sizes_hw": np.full((batch, 2), float(canvas), np.float32),
        "joints": (rng.rand(batch, 21, 2) * canvas).astype(np.float32),
        "joints_vis": np.ones((batch, 21), np.float32),
        "label": rng.randint(0, 19, (batch,)).astype(np.int32),
    }
    out = {}
    for name, mesh_shape, fused, tp in (
            ("dp_packed", {"data": 1}, True, False),
            ("tp_split", {"data": 1, "model": 1}, "split", True)):
        mesh = make_mesh(mesh_shape)
        model = MultiTaskNet(image_size=(image, image),
                             dtype=jnp.bfloat16, fused_attention=fused)
        state, _ = create_train_state(
            model, jax.random.PRNGKey(0), (1, image, image, 3),
            lr=1e-3, milestones_steps=(10_000,))
        state = shard_state(state, mesh, tp)
        step = make_parallel_train_step(
            mesh, AugmentConfig(), state, image_size=(image, image),
            heatmap_size=(image // 4, image // 4), tensor_parallel=tp)
        key = jax.random.PRNGKey(7)
        with mesh:
            sharded = shard_batch(host_batch, mesh)
            key_d = jax.device_put(
                key, jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))
            t0 = time.perf_counter()
            state, metrics = step(state, sharded, key_d)
            loss0 = float(metrics["total_loss"])
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(steps):
                t0 = time.perf_counter()
                state, metrics = step(state, sharded, key_d)
                jax.block_until_ready(metrics["total_loss"])
                times.append(time.perf_counter() - t0)
        out[name] = {"ms_per_step": round(float(np.median(times)) * 1e3, 1),
                     "crops_per_s": round(batch / float(np.median(times))),
                     "compile_s": round(compile_s, 1),
                     "loss0": round(loss0, 5)}
    return out


def kernel_level(batch, steps):
    """Per-layer attention core cost at train shapes: packed 8-head vs
    the split kernel at 8 heads (TP-mode, full) and 4 heads (the TP=2
    local group at HALF batch — each TP=2 device sees the full global
    batch's tokens, so we report 4-head cost at the same token count)."""
    import jax
    import jax.numpy as jnp

    from hgr_tpu.ops.attention_pallas import (fused_attention_qkv,
                                              fused_attention_split)

    N, D, DIM = 145, 32, 256
    rng = np.random.RandomState(1)
    scale = D ** -0.5

    def slope_time(fn, *args, k_lo=64, k_hi=512):
        @partial(jax.jit, static_argnums=(1,))
        def multi(x, n):
            def body(c, _):
                y = fn(c, *args)
                # data dependence between iterations without changing
                # the shape: feed the output back as the next input
                return y, ()
            y, _ = jax.lax.scan(body, x, None, length=n)
            return y

        def sync(y):
            # value read: through the axon tunnel block_until_ready
            # returns on handle existence, not completion
            return float(jnp.sum(y[0, 0, :4].astype(jnp.float32)))

        x0 = jnp.asarray(rng.randn(batch, N, 3 * DIM), jnp.bfloat16)
        ts = {}
        for k in (k_lo, k_hi):
            sync(multi(x0, k))
            best = []
            for _ in range(steps):
                t0 = time.perf_counter()
                sync(multi(x0, k))
                best.append(time.perf_counter() - t0)
            ts[k] = float(np.median(best))
        return (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)

    def packed(qkv):
        return jnp.concatenate([fused_attention_qkv(
            qkv, 8, D, scale, False, None)] * 3, -1)

    def split8(qkv):
        q, k, v = jnp.split(qkv, 3, -1)
        return jnp.concatenate([fused_attention_split(
            q, k, v, 8, D, scale, False, None)] * 3, -1)

    def split4(qkv):
        # TP=2 local group: 4 heads, inner dim 128 — half the qkv width
        q, k, v = jnp.split(qkv[..., : 3 * DIM // 2], 3, -1)
        y = fused_attention_split(q, k, v, 4, D, scale, False, None)
        return jnp.concatenate([y] * 6, -1)

    return {
        "packed_8h_ms": round(slope_time(packed) * 1e3, 3),
        "split_8h_ms": round(slope_time(split8) * 1e3, 3),
        "split_4h_local_ms": round(slope_time(split4) * 1e3, 3),
        "tokens": batch * N,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--image", type=int, default=192)
    ap.add_argument("--canvas", type=int, default=192)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--kernel_only", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    result = {"batch": args.batch}
    result["kernel"] = kernel_level(args.batch, args.steps)
    print(json.dumps({"kernel": result["kernel"]}), flush=True)
    if not args.kernel_only:
        result["step"] = step_level(args.batch, args.image, args.canvas,
                                    args.steps)
        print(json.dumps({"step": result["step"]}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
