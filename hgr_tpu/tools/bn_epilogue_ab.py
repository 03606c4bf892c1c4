"""Chip A/B: autodiff BN+SiLU backward vs the fused two-pass epilogue
(ops/bn_act_pallas.py) over the GELAN backbone's BN layer inventory.

The HLO attribution (BENCH_LOG round 4) measured the autodiff BN
coupling chains at 30.0 ms of the 247 ms B=1024 train step. This tool
times exactly that sub-computation both ways at the backbone's real
layer shapes: one jitted grad per route summing every layer's
sum(chain(y_l) * ct_l), slope-timed (chained scan, value-read sync).

Inventory (GELAN small @192px, approximate ConvBnAct census —
spatial x channels x count):
  96x96x64 x1 (conv1), 48x48x128 x1 (conv2),
  48x48x64 x5 + 48x48x128 x2 (cspelan1),
  24x24x256 x1 (down1), 24x24x128 x5 + 24x24x256 x2 (cspelan2),
  12x12x512 x1 (down2), 12x12x256 x5 + 12x12x512 x2 (cspelan3).

Usage: python -m hgr_tpu.tools.bn_epilogue_ab [--batch 256] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

INVENTORY = [
    (96, 64, 1), (48, 128, 1), (48, 64, 5), (48, 128, 2),
    (24, 256, 1), (24, 128, 5), (24, 256, 2),
    (12, 512, 1), (12, 256, 5), (12, 512, 2),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k_lo", type=int, default=2)
    ap.add_argument("--k_hi", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--per_shape", action="store_true",
                    help="time each distinct layer shape in its OWN "
                         "small jit and sum count-weighted (the single "
                         "25-layer chained program reliably crashes "
                         "this sandbox's remote compile helper — "
                         "'Broken pipe', two attempts, BENCH_LOG r5)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hgr_tpu.ops import bn_act_pallas as bna
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B = args.batch
    rng = np.random.RandomState(0)
    ys, cts, gammas, betas = [], [], [], []
    for hw, c, cnt in INVENTORY:
        for _ in range(cnt):
            ys.append(jnp.asarray(
                rng.randn(B, hw, hw, c) * 0.5, jnp.bfloat16))
            cts.append(jnp.asarray(rng.randn(B, hw, hw, c), jnp.bfloat16))
            gammas.append(jnp.asarray(rng.rand(c) + 0.5, jnp.float32))
            betas.append(jnp.asarray(rng.randn(c) * 0.1, jnp.float32))
    n_layers = len(ys)
    bytes_per_crop = sum(
        hw * hw * c * cnt * 2 for hw, c, cnt in INVENTORY)
    print(json.dumps({"layers": n_layers, "batch": B,
                      "activation_mb": round(
                          bytes_per_crop * B / 2**20, 1)}), flush=True)

    def chain(y, gamma, beta):
        yf = y.astype(jnp.float32)
        mean = jnp.mean(yf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(yf - mean), axis=(0, 1, 2))
        z = (yf - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        return (z * jax.nn.sigmoid(z)).astype(y.dtype)

    def loss_autodiff(ys_, gammas_, betas_):
        tot = jnp.float32(0.0)
        for y, gm, bt, ct in zip(ys_, gammas_, betas_, cts):
            tot += jnp.sum(chain(y, gm, bt).astype(jnp.float32)
                           * ct.astype(jnp.float32))
        return tot

    def loss_fused(ys_, gammas_, betas_):
        tot = jnp.float32(0.0)
        for y, gm, bt, ct in zip(ys_, gammas_, betas_, cts):
            out, _, _ = bna.bn_act(y, gm, bt, 1e-5)
            tot += jnp.sum(out.astype(jnp.float32)
                           * ct.astype(jnp.float32))
        return tot

    def slope(loss_fn, tag):
        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2))

        @partial(jax.jit, static_argnums=(1,))
        def multi(ys0, n):
            def body(carry, _):
                dys, dgs, dbs = grad_fn(carry, gammas, betas)
                # feed dy back as the next y: data dependence between
                # iterations (cast keeps dtype)
                return [d.astype(jnp.bfloat16) for d in dys], ()
            ys_out, _ = jax.lax.scan(body, ys0, None, length=n)
            return ys_out

        def sync(out):
            return float(jnp.sum(out[0][0, 0, 0, :4].astype(jnp.float32)))

        ts = {}
        for k in (args.k_lo, args.k_hi):
            sync(multi(ys, k))
            best = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                sync(multi(ys, k))
                best.append(time.perf_counter() - t0)
            ts[k] = float(np.median(best))
        s = (ts[args.k_hi] - ts[args.k_lo]) / (args.k_hi - args.k_lo)
        print(json.dumps({tag: {"ms_per_iter": round(s * 1e3, 2),
                                "T_lo_s": round(ts[args.k_lo], 3),
                                "T_hi_s": round(ts[args.k_hi], 3)}}),
              flush=True)
        return s

    # numeric cross-check before timing (grads agree at bf16 tolerance).
    # Runs PER LAYER at a reduced batch: the full-batch two-tree compare
    # (2 x 1.7 GB grads + autodiff temporaries) OOMs a 16 GB chip beside
    # the timing ballast; per-layer at B=32 exercises the same kernel
    # code paths (incl. the padded last block) at ~1% of the memory.
    bc = min(32, B)
    rel = 0.0
    seen_shapes = set()
    for li in range(n_layers):
        if ys[li].shape[1:] in seen_shapes:  # one check per layer shape
            continue
        seen_shapes.add(ys[li].shape[1:])
        ysmall = ys[li][:bc]
        ctsmall = cts[li][:bc].astype(jnp.float32)

        def one_auto(y):
            return jnp.sum(chain(y, gammas[li], betas[li])
                           .astype(jnp.float32) * ctsmall)

        def one_fused(y):
            out, _, _ = bna.bn_act(y, gammas[li], betas[li], 1e-5)
            return jnp.sum(out.astype(jnp.float32) * ctsmall)

        a = jax.grad(one_auto)(ysmall)
        b = jax.grad(one_fused)(ysmall)
        rel = max(rel, float(
            jnp.linalg.norm((a - b).astype(jnp.float32))
            / (jnp.linalg.norm(a.astype(jnp.float32)) + 1e-9)))
    print(json.dumps({"max_rel_grad_diff": round(rel, 5),
                      "check_batch": bc,
                      "checked_shapes": len(seen_shapes)}), flush=True)

    if args.per_shape:
        def shape_slope(hw, c, fused):
            y0 = jnp.asarray(rng.randn(B, hw, hw, c) * 0.5, jnp.bfloat16)
            ct0 = jnp.asarray(rng.randn(B, hw, hw, c), jnp.bfloat16)
            gm0 = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
            bt0 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

            # ct/gm/bt must be jit ARGUMENTS: closed over, they are
            # baked into the serialized compile payload as constants —
            # a (256,96,96,64) bf16 cotangent is ~288 MB of MLIR, which
            # this sandbox's remote compile helper rejects (HTTP 413)
            # or chokes on (Broken pipe) — the root cause of every
            # failed run of this tool's earlier chained form.
            def one(y, ct, gm, bt):
                out = (bna.bn_act(y, gm, bt, 1e-5)[0] if fused
                       else chain(y, gm, bt))
                return jnp.sum(out.astype(jnp.float32)
                               * ct.astype(jnp.float32))

            g = jax.grad(one)

            @partial(jax.jit, static_argnums=(4,))
            def multi(y, ct, gm, bt, n):
                def body(carry, _):
                    return g(carry, ct, gm, bt).astype(jnp.bfloat16), ()
                out, _ = jax.lax.scan(body, y, None, length=n)
                return out

            def sync(out):
                return float(jnp.sum(out[0, 0, :4].astype(jnp.float32)))

            ts = {}
            for k in (args.k_lo, args.k_hi):
                sync(multi(y0, ct0, gm0, bt0, k))
                best = []
                for _ in range(args.iters):
                    t0 = time.perf_counter()
                    sync(multi(y0, ct0, gm0, bt0, k))
                    best.append(time.perf_counter() - t0)
                ts[k] = float(np.median(best))
            return (ts[args.k_hi] - ts[args.k_lo]) / (
                args.k_hi - args.k_lo)

        per_shape = []
        tot_auto = tot_fused = 0.0
        for hw, c, cnt in INVENTORY:
            sa = shape_slope(hw, c, fused=False)
            sf = shape_slope(hw, c, fused=True)
            tot_auto += sa * cnt
            tot_fused += sf * cnt
            row = {"hw": hw, "c": c, "count": cnt,
                   "autodiff_ms": round(sa * 1e3, 3),
                   "fused_ms": round(sf * 1e3, 3)}
            per_shape.append(row)
            print(json.dumps(row), flush=True)
        result = {
            "mode": "per_shape", "batch": B,
            "max_rel_grad_diff": round(rel, 5),
            "autodiff_ms_total": round(tot_auto * 1e3, 2),
            "fused_ms_total": round(tot_fused * 1e3, 2),
            "speedup": round(tot_auto / max(tot_fused, 1e-9), 3),
            "scaled_to_b1024_ms": {
                "autodiff": round(tot_auto * 1e3 * 1024 / B, 1),
                "fused": round(tot_fused * 1e3 * 1024 / B, 1),
            },
            "per_shape": per_shape,
        }
        print(json.dumps(result), flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(result, f, indent=1)
        return

    s_auto = slope(loss_autodiff, "autodiff_chain")
    s_fused = slope(loss_fused, "fused_epilogue")
    result = {
        "batch": B, "layers": n_layers,
        "autodiff_ms": round(s_auto * 1e3, 2),
        "fused_ms": round(s_fused * 1e3, 2),
        "speedup": round(s_auto / max(s_fused, 1e-9), 3),
        "max_rel_grad_diff": round(rel, 5),
        "scaled_to_b1024_ms": {
            "autodiff": round(s_auto * 1e3 * 1024 / B, 1),
            "fused": round(s_fused * 1e3 * 1024 / B, 1),
        },
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
