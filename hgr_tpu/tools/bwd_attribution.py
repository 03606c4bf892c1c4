"""Attribute the train step's backward-pass time (VERDICT r2 #2 follow-up).

The corrected round-3 decomposition (BENCH_LOG.md) pinned the B=1024
train step at 275 ms with 183 ms in the backward. This tool splits that
183 ms between the GELAN backbone and the ViT/decoder head, and isolates
BatchNorm's batch-statistics coupling, using the same cumulative-prefix
method as bench_suite.py (separate jits, medians, deltas — per-op device
traces are unavailable through the tunnel).

Graphs timed (all bf16, model-ready images, no preprocess):
  fwd_loss    full forward + multitask loss
  grad_full   value_and_grad of the full loss (the train step's core)
  fwd_bb      backbone-only forward (scalar-sum readout)
  grad_bb     grad of fwd_bb wrt backbone params
  grad_head   grad of the full loss wrt NON-encoder params only — the
              encoder backward is dead code XLA removes, so this times
              forward + head backward
  grad_evalbn grad_full with train=False BN (running stats; removes the
              batch-stat coupling from the backward)

Derived:
  backbone bwd ≈ grad_bb - fwd_bb
  head bwd     ≈ grad_head - fwd_loss
  BN coupling  ≈ grad_full - grad_evalbn

Usage: python -m hgr_tpu.tools.bwd_attribution [--batch 1024] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(out):
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
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--platform", type=str, default="",
                        help="force a jax platform (e.g. 'cpu'); the "
                             "sandbox sitecustomize pre-imports jax, so "
                             "JAX_PLATFORMS in the environment is NOT "
                             "honored — this routes through "
                             "jax.config.update before backend init")
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.models.gelan import GELANNet
    from hgr_tpu.models.multitasknet import heatmaps_to_nchw
    from hgr_tpu.ops.losses import multitask_loss
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B = args.batch
    dev = str(jax.devices()[0])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 192, 192, 3), jnp.bfloat16)
    label = jnp.asarray(rng.randint(0, 19, (B,)), jnp.int32)
    target = jnp.asarray(rng.rand(B, 21, 48, 48), jnp.float32)
    tw = jnp.ones((B, 21, 1), jnp.float32)

    model = MultiTaskNet(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 192, 192, 3)), train=False)
    params, stats = variables["params"], variables["batch_stats"]

    def emit(name, ms):
        print(json.dumps({"metric": name, "value": round(ms, 2),
                          "unit": "ms", "batch": B, "device": dev}),
              flush=True)

    # Data rides as ARGUMENTS, not closure constants: baked-in 200+ MB
    # constants exceed the remote compile server's request size limit
    # (HTTP 413) and bloat every graph.
    def full_loss(p, xb, yb, tb, twb, train):
        v = {"params": p, "batch_stats": stats}
        if train:
            (cls, hmap, _), _ = model.apply(
                v, xb, train=True, need_attnmap=False,
                mutable=["batch_stats"])
        else:
            cls, hmap, _ = model.apply(v, xb, train=False,
                                       need_attnmap=False)
        total, _ = multitask_loss(cls, heatmaps_to_nchw(hmap), yb, tb, twb)
        return total

    results = {}

    @jax.jit
    def fwd_loss(p, xb, yb, tb, twb):
        return full_loss(p, xb, yb, tb, twb, True)

    results["fwd_loss"] = _timeit(fwd_loss, params, x, label, target, tw,
                                  iters=args.iters) * 1e3
    emit("fwd_loss", results["fwd_loss"])

    @jax.jit
    def grad_full(p, xb, yb, tb, twb):
        return jax.value_and_grad(
            lambda q: full_loss(q, xb, yb, tb, twb, True))(p)

    results["grad_full"] = _timeit(grad_full, params, x, label, target, tw,
                                   iters=args.iters) * 1e3
    emit("grad_full", results["grad_full"])

    # --- backbone only ---
    bb = GELANNet("small", dtype=jnp.bfloat16)
    bvars = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)),
                    train=False)
    bparams, bstats = bvars["params"], bvars["batch_stats"]

    def bb_loss(p, xb):
        out, _ = bb.apply({"params": p, "batch_stats": bstats}, xb,
                          train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    results["fwd_bb"] = _timeit(jax.jit(bb_loss), bparams, x,
                                iters=args.iters) * 1e3
    emit("fwd_bb", results["fwd_bb"])

    @jax.jit
    def grad_bb(p, xb):
        return jax.value_and_grad(bb_loss)(p, xb)

    results["grad_bb"] = _timeit(grad_bb, bparams, x,
                                 iters=args.iters) * 1e3
    emit("grad_bb", results["grad_bb"])

    # --- head only: differentiate wrt non-encoder params; the encoder
    # backward is then dead code and XLA strips it ---
    rest = {k: v for k, v in params.items() if k != "encoder"}
    enc = params["encoder"]

    @jax.jit
    def grad_head(r, e, xb, yb, tb, twb):
        def loss(r_):
            return full_loss({"encoder": e, **r_}, xb, yb, tb, twb, True)
        return jax.value_and_grad(loss)(r)

    results["grad_head"] = _timeit(grad_head, rest, enc, x, label, target,
                                   tw, iters=args.iters) * 1e3
    emit("grad_head", results["grad_head"])

    # --- BN batch-stat coupling: eval-mode BN backward ---
    @jax.jit
    def grad_evalbn(p, xb, yb, tb, twb):
        return jax.value_and_grad(
            lambda q: full_loss(q, xb, yb, tb, twb, False))(p)

    results["grad_evalbn"] = _timeit(grad_evalbn, params, x, label, target,
                                     tw, iters=args.iters) * 1e3
    emit("grad_evalbn", results["grad_evalbn"])

    emit("derived: backbone bwd", results["grad_bb"] - results["fwd_bb"])
    emit("derived: head bwd", results["grad_head"] - results["fwd_loss"])
    emit("derived: full bwd", results["grad_full"] - results["fwd_loss"])
    emit("derived: BN batch coupling",
         results["grad_full"] - results["grad_evalbn"])


if __name__ == "__main__":
    main()
