"""Same-process A/B: BatchNorm normalize-chain dtype (f32 vs bf16).

Round-3 backward attribution (BENCH_LOG) measured the BN batch-stat
coupling at ~22 ms of the B=1024 train step and left it as the one
unretired lever on the conv backward. Under bf16 compute the BN
normalize/scale math still runs in float32 (layers.ConvBnAct), so its
forward fusion and backward coupling move 2x the bytes of the
surrounding bf16 convs. This tool measures the device-only train-step
slope (train_step_slope method: K chained scan steps, slope cancels
dispatch) for both settings in ONE process so cross-process compile
variance cannot masquerade as a win, and prints the loss trajectories
so a numerics drift would be visible next to the timing.

Usage: python -m hgr_tpu.tools.bn_dtype_ab [--batch 1024] [--iters 6]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np


def _timeit(fn, iters=6, warmup=2):
    import jax
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    out = fn()  # always at least one untimed call (also covers warmup=0)
    for _ in range(max(warmup - 1, 0)):
        out = fn()
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--canvas", type=int, default=256)
    parser.add_argument("--k_lo", type=int, default=4)
    # Defaults match the recorded BENCH_LOG measurement (K=4 vs K=16,
    # 5 iters), so rerunning with no flags reproduces the headline row.
    parser.add_argument("--k_hi", type=int, default=16)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--platform", type=str, default="")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from hgr_tpu.config import AugmentConfig
    from hgr_tpu.models import MultiTaskNet, layers
    from hgr_tpu.train.state import create_train_state
    from hgr_tpu.train.steps import make_train_step
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, CS = args.batch, args.canvas
    rng = np.random.RandomState(0)
    batch = {
        "canvas": jnp.asarray(rng.randint(0, 255, (B, CS, CS, 3)),
                              jnp.uint8),
        "orig_to_canvas": jnp.tile(
            jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]]), (B, 1, 1)),
        "sizes_hw": jnp.full((B, 2), float(CS)),
        "joints": jnp.asarray(rng.rand(B, 21, 2) * CS, jnp.float32),
        "joints_vis": jnp.ones((B, 21)),
        "label": jnp.asarray(rng.randint(0, 19, (B,)), jnp.int32),
    }
    key = jax.random.PRNGKey(0)

    def run_mode(bn_dtype):
        layers._BN_DTYPE = bn_dtype
        model = MultiTaskNet(dtype=jnp.bfloat16)
        state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                      (1, 192, 192, 3), lr=1e-3,
                                      milestones_steps=(10**6,))
        inner = make_train_step(AugmentConfig(), donate=False)
        step_fn = (inner.__wrapped__
                   if hasattr(inner, "__wrapped__") else inner)

        @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
        def multi(st, b, k, n):
            def body(s, i):
                s2, m = step_fn(s, b, jax.random.fold_in(k, i))
                return s2, m["total_loss"]

            st, losses = jax.lax.scan(body, st, jnp.arange(n))
            return st, losses

        out = {}
        for kk in (args.k_lo, args.k_hi):
            def run(kk=kk):
                st = jax.tree_util.tree_map(jnp.copy, state)
                return multi(st, batch, key, kk)[1]

            out[kk], losses = _timeit(run, iters=args.iters)
        slope = (out[args.k_hi] - out[args.k_lo]) / (
            args.k_hi - args.k_lo)
        return slope, np.asarray(losses, np.float64)

    for name, dt in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        slope, losses = run_mode(dt)
        print(json.dumps({
            "bn_dtype": name,
            "device_step_ms": round(slope * 1e3, 2),
            "crops_per_s": round(B / slope, 0),
            "batch": B,
            # full measurement config, so the record reproduces the run
            "k_lo": args.k_lo, "k_hi": args.k_hi, "iters": args.iters,
            "canvas": args.canvas,
            "losses": [round(float(x), 5) for x in losses],
        }), flush=True)


if __name__ == "__main__":
    main()
