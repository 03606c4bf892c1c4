"""Device-only train-step time via the chained-scan slope method.

Every per-step timing recorded through this sandbox's tunneled TPU
carries ~25-30 ms of dispatch/RTT that a PCIe-attached production host
would not pay (the same artifact BENCH_LOG round 3 cancelled for the
detect->classify latency). This tool runs K full train steps back-to-
back inside ONE jit (lax.scan; the TrainState threads through the
carry, so iterations are data-dependent and cannot be collapsed; the
augment key is folded per iteration so no two steps do identical work)
and reports the slope between two K values — the constant dispatch cost
cancels exactly, leaving pure device ms/step.

The scanned step is the REAL production step (train/steps.py inner
logic: device augment -> forward -> backward -> AdamW -> metrics) on a
device-resident uint8 canvas batch, i.e. exactly what the device-cache
epoch loop executes per step.

Usage: python -m hgr_tpu.tools.train_step_slope [--batch 1024]
           [--k_lo 4] [--k_hi 16] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _timeit(fn, *args, iters=10, warmup=2):
    import jax.numpy as jnp

    def sync(out):
        import jax
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf).astype(jnp.float32))

    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--canvas", type=int, default=256)
    parser.add_argument("--k_lo", type=int, default=4)
    parser.add_argument("--k_hi", type=int, default=16)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--platform", type=str, default="")
    parser.add_argument("--grad_demix", nargs="?", const="on",
                        default="off", choices=["on", "off", "batched"],
                        help="time the de-mixed step (train/steps.py "
                             "grad_demix): bare flag/'on' = two "
                             "pullbacks, 'batched' = one batch-2 "
                             "backward")
    parser.add_argument("--bn_dtype", type=str, default="",
                        choices=["", "float32", "bfloat16"])
    parser.add_argument("--remat", action="store_true",
                        help="backbone+pose-head rematerialization "
                             "(ModelConfig.remat) — the production "
                             "big-batch config (tools/hagrid_fit.py)")
    parser.add_argument("--accum", type=int, default=1,
                        help="grad_accum microbatches")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from hgr_tpu.config import AugmentConfig
    from hgr_tpu.models import MultiTaskNet
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

    model = MultiTaskNet(dtype=jnp.bfloat16, remat=args.remat)
    state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                  (1, 192, 192, 3), lr=1e-3,
                                  milestones_steps=(10**6,))
    if args.bn_dtype:
        from hgr_tpu.models import layers

        layers._BN_DTYPE = (jnp.bfloat16 if args.bn_dtype == "bfloat16"
                            else jnp.float32)
    demix = {"on": True, "off": False, "batched": "batched"}[
        args.grad_demix]
    inner = make_train_step(AugmentConfig(), donate=False,
                            grad_demix=demix, grad_accum=args.accum)
    step_fn = inner.__wrapped__ if hasattr(inner, "__wrapped__") else inner

    from functools import partial

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def multi(st, b, key, n):
        def body(s, i):
            s2, m = step_fn(s, b, jax.random.fold_in(key, i))
            return s2, m["total_loss"]

        st, losses = jax.lax.scan(body, st, jnp.arange(n))
        return st, losses

    key = jax.random.PRNGKey(0)
    results = {}
    for k in (args.k_lo, args.k_hi):
        # donation consumes the state; keep a fresh copy per timing call
        def run(k=k):
            st = jax.tree_util.tree_map(jnp.copy, state)
            return multi(st, batch, key, k)[1]

        results[k] = _timeit(run, iters=args.iters)
        print(json.dumps({"metric": f"T(K={k})",
                          "value": round(results[k] * 1e3, 2),
                          "unit": "ms"}), flush=True)

    slope = (results[args.k_hi] - results[args.k_lo]) / (
        args.k_hi - args.k_lo)
    print(json.dumps({
        "metric": "device-only train step (slope)",
        "value": round(slope * 1e3, 2),
        "unit": "ms",
        "crops_per_s": round(B / slope, 0),
        "batch": B,
        "grad_demix": args.grad_demix,
        "remat": args.remat,
        "accum": args.accum,
        "bn_dtype": args.bn_dtype or "float32",
        "overhead_cancelled_ms": round(
            (results[args.k_lo] - slope * args.k_lo) * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
