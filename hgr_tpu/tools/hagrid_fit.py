"""Full-HaGRID sharded-cache fit: MEASURED, not projected (VERDICT r3 #6).

Round 3's claim "45 GB / 8 chips = 5.6 GB/chip + step <= 5.25 GB fits
v5e" was arithmetic on two separate measurements. This tool measures the
actual configuration both ways:

* ``--mode virtual``: builds the REAL ShardedDeviceCacheLoader at full
  HaGRID geometry (410,800 rows, canvas 192 ~ 45 GB) on an 8-device CPU
  mesh — the true allocation, jitted block writes, shard_map gather, and
  epoch plan — and iterates batches, verifying per-device byte
  accounting and the batch layout. The JPEG-decode fill path is already
  proven at 102k scale (BENCH_LOG "Full-recipe-scale rehearsal"); here
  the fill is random blocks THROUGH THE SAME jitted write, because
  decoding 410k synthetic JPEGs on this sandbox's single core would add
  hours without testing anything new.

* ``--mode chip``: allocates the exact per-chip cache byte load
  (ceil(410,800/8) = 51,350 flat rows at canvas 192, ~5.7 GB) on the
  real TPU next to the REAL B=1024 remat+grad-accum train step
  (canvas-in, fused jitter+warp, as the 102k rehearsal ran it) and
  reports the device memory headroom from live allocator stats — or
  walks the recorded fallback ladder (accum 4, canvas 144) if it OOMs.

Usage:
  python -m hgr_tpu.tools.hagrid_fit --mode chip [--batch 1024]
  python -m hgr_tpu.tools.hagrid_fit --mode virtual [--n 410800]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

HAGRID_N = 410_800  # reference configs/hagrid.yaml:3-5 train-split crops


def run_virtual(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", args.devices)
    import jax.numpy as jnp

    from hgr_tpu.data import device_cache
    from hgr_tpu.data.dataset import AnnotationIndex, Sample
    from hgr_tpu.parallel.mesh import make_mesh

    n, cs, d = args.n, args.canvas, args.devices
    mesh = make_mesh({"data": d})

    # Geometry-only index: real Sample records (so fingerprints and
    # label maps behave), pointing at no files — the fill below never
    # opens them.
    names = {f"c{i}": i for i in range(19)}
    samples = [Sample(image_path=f"mem://{i}", label=f"c{i % 19}",
                      landmark=[]) for i in range(n)]
    index = AnnotationIndex(samples=samples, names=names)

    filled_rows = []
    real_fill = device_cache._fill_cache

    def random_fill(loader, cache, write, spec, n_total, mesh=None):
        """Same jitted ``write`` path as the real fill, random payload:
        covers the first/last block of each shard boundary region."""
        rng = np.random.RandomState(0)
        rows = max(1, (64 << 20) // (loader.canvas_size ** 2 * 3))
        starts = []
        n_local = -(-n_total // d)
        for s in range(d):  # both edges of every shard
            starts += [s * n_local, min((s + 1) * n_local, n_total) - rows]
        for start in sorted({max(0, min(s, n_total - rows))
                             for s in starts}):
            block = {}
            for k, (flat, _, dt) in spec.items():
                if np.dtype(dt) == np.uint8:
                    block[k] = jnp.asarray(rng.randint(
                        0, 255, (rows, flat), np.uint8))
                elif k == "label":
                    block[k] = jnp.asarray(rng.randint(
                        0, 19, (rows, flat), np.int32))
                else:
                    block[k] = jnp.asarray(
                        rng.rand(rows, flat).astype(np.float32) + 0.5)
            cache = write(cache, block, start)
            filled_rows.append((start, rows))
        return cache, False

    device_cache._fill_cache = random_fill
    try:
        loader = device_cache.ShardedDeviceCacheLoader(
            index, mesh, batch_size=args.batch, canvas_size=cs,
            shuffle=True, num_workers=0)
        t0 = time.perf_counter()
        it = iter(loader)
        first = next(it)
        t_build = time.perf_counter() - t0
    finally:
        device_cache._fill_cache = real_fill

    # per-device byte accounting from the actual sharded buffers
    per_dev = np.zeros(d, np.int64)
    for k, v in loader._cache.items():
        for sh in v.addressable_shards:
            per_dev[sh.device.id] += sh.data.nbytes
    t1 = time.perf_counter()
    n_batches = 1
    for batch in it:
        n_batches += 1
        if n_batches >= args.batches:
            break
    gather_ms = (time.perf_counter() - t1) / max(n_batches - 1, 1) * 1e3

    expected_row = sum(flat * np.dtype(dt).itemsize for flat, _, dt
                       in device_cache._flat_shapes(1, cs, 21).values())
    report = {
        "mode": "virtual",
        "n": n, "canvas": cs, "devices": d,
        "row_bytes": int(expected_row),
        "total_cache_gb": round(float(per_dev.sum()) / 2**30, 2),
        "per_device_gb": [round(float(b) / 2**30, 3) for b in per_dev],
        "build_s": round(t_build, 1),
        "batch_keys": sorted(first.keys()),
        "batch_canvas_shape": list(np.asarray(first["canvas"]).shape),
        "valid_sum_first_batch": float(np.asarray(first["valid"]).sum()),
        "gather_ms_per_batch_cpu": round(gather_ms, 1),
        "batches_iterated": n_batches,
        "filled_blocks": len(filled_rows),
    }
    # invariants: equal shards, nominal (untiled) byte size per device
    n_pad = loader.n_local * d
    nominal = expected_row * n_pad / d
    assert abs(per_dev.max() - per_dev.min()) <= 1, per_dev
    assert per_dev[0] <= nominal * 1.01, (per_dev[0], nominal)
    assert first["canvas"].shape[0] == args.batch
    print(json.dumps(report, indent=1))


def run_chip(args) -> None:
    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import AugmentConfig
    from hgr_tpu.data.device_cache import _flat_shapes
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.train.state import create_train_state
    from hgr_tpu.train.steps import make_train_step
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    n_local = -(-args.n // 8)  # per-chip rows of an 8-chip pod split

    ladder = [
        {"canvas": args.canvas, "grad_accum": args.grad_accum},
        {"canvas": args.canvas, "grad_accum": 4},
        {"canvas": 144, "grad_accum": 4},
    ]
    results = []
    for cfg in ladder:
        cs, accum = cfg["canvas"], cfg["grad_accum"]
        spec = _flat_shapes(n_local, cs, 21)
        try:
            ballast = {
                k: jnp.zeros((n_local, flat), jnp.dtype(dt))
                for k, (flat, _, dt) in spec.items()
            }
            jax.block_until_ready(ballast)
            ballast_gb = sum(v.nbytes for v in ballast.values()) / 2**30

            B = args.batch
            rng = np.random.RandomState(0)
            batch = {
                "canvas": jnp.asarray(
                    rng.randint(0, 255, (B, cs, cs, 3)), jnp.uint8),
                "orig_to_canvas": jnp.tile(jnp.asarray(
                    [[1.0, 0, 0], [0, 1.0, 0]]), (B, 1, 1)),
                "sizes_hw": jnp.full((B, 2), float(cs)),
                "joints": jnp.asarray(rng.rand(B, 21, 2) * cs, jnp.float32),
                "joints_vis": jnp.ones((B, 21)),
                "label": jnp.asarray(rng.randint(0, 19, (B,)), jnp.int32),
            }
            model = MultiTaskNet(dtype=jnp.bfloat16, remat=True)
            state, _ = create_train_state(
                model, jax.random.PRNGKey(0), (1, 192, 192, 3), lr=1e-3,
                milestones_steps=(10**6,))
            step = make_train_step(AugmentConfig(), grad_accum=accum,
                                   donate=args.donate)
            key = jax.random.PRNGKey(1)
            t0 = time.perf_counter()
            state2, m = step(state, batch, key)
            jax.block_until_ready(m["total_loss"])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state2, m = step(state2, batch, key)
            # a VALUE read, not block_until_ready: through the axon
            # tunnel block_until_ready returns on handle existence, not
            # computation completion (measured: 1.9 "ms" for a ~400 ms
            # step) — the same reason every slope tool syncs via sums
            float(m["total_loss"])
            step_s = (time.perf_counter() - t0) / args.iters
            stats = dev.memory_stats() or {}
            # Record the SUCCESS entry before any destructive probing:
            # the headroom probe below intentionally drives the device
            # to OOM, and a remote-TPU OOM can poison the client for
            # every op after it (observed: it fails float() reads and
            # every later ladder rung in the same process).
            entry = {
                "canvas": cs, "grad_accum": accum, "fits": True,
                "donate": args.donate,
                "ballast_gb": round(ballast_gb, 2),
                "step_ms": round(step_s * 1e3, 1),
                "crops_per_s": round(B / step_s),
                "compile_s": round(compile_s, 1),
                "loss": float(m["total_loss"]),
                "allocator_stats": bool(stats),
            }
            results.append(entry)
            print(json.dumps({"fit": entry}), flush=True)
            if args.probe_headroom:
                # allocate 512 MB slabs next to ballast+step until the
                # device refuses; a real step must still run each time
                extra = []
                try:
                    for _ in range(24):
                        extra.append(jax.block_until_ready(
                            jnp.zeros((512 << 20,), jnp.uint8)))
                        state2, m2 = step(state2, batch, key)
                        jax.block_until_ready(m2["total_loss"])
                except Exception:
                    pass
                entry["probed_headroom_gb"] = len(extra) * 0.5
                del extra
            del ballast, batch, state, state2
            break  # first fitting config is the answer
        except Exception as exc:  # XlaRuntimeError OOM -> next rung
            results.append({"canvas": cs, "grad_accum": accum,
                            "fits": False, "error": str(exc)[:300]})
            continue
    print(json.dumps({"mode": "chip", "n_local_rows": n_local,
                      "batch": args.batch, "ladder": results}, indent=1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["virtual", "chip"], required=True)
    ap.add_argument("--n", type=int, default=HAGRID_N)
    ap.add_argument("--canvas", type=int, default=192)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--grad_accum", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--probe_headroom", action="store_true",
                    help="after a fitting config, allocate 512 MB slabs "
                         "until OOM to measure headroom (destructive: "
                         "leaves the remote client unusable afterwards)")
    ap.add_argument("--donate", action="store_true",
                    help="donate the TrainState like the production "
                         "epoch loop does (diagnostic for the r5 "
                         "loop-timing anomaly: non-donated steps keep "
                         "two full state copies alive per call)")
    args = ap.parse_args()
    if args.mode == "virtual":
        run_virtual(args)
    else:
        run_chip(args)


if __name__ == "__main__":
    main()
