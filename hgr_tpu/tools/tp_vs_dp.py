"""Measure TP vs DP train-step cost on the 8-virtual-CPU mesh.

VERDICT r2 #8 asked for the cost story behind the tensor-parallel
routing; the first round-3 measurement (BENCH_LOG "TP vs DP step cost")
was an ad-hoc snippet — this commits it, and adds the attention-mode
axis introduced by the head-sharded split kernel: TP meshes can now run
``fused_attention='split'`` (the fused Pallas core per local head
group) instead of falling back to the unfused XLA chain.

CPU-proxy caveat (same as the original measurement): on the virtual CPU
mesh the Pallas kernels trace through their XLA fallbacks, so absolute
times mean nothing and kernel-level wins don't show — what the proxy
DOES expose is the COLLECTIVE/resharding structure each mode compiles
to, which is what separates DP from TP at this model size. A/B within
one process only.

Usage (from repo root):
    python -m hgr_tpu.tools.tp_vs_dp [--batch 64] [--image 96] [--steps 5]
"""

from __future__ import annotations

import argparse
import os
import time


def _measure(mesh_shape, fused_attention, tensor_parallel, batch, image,
             canvas, steps):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hgr_tpu.config import AugmentConfig
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.parallel.mesh import make_mesh, shard_batch
    from hgr_tpu.parallel.steps import make_parallel_train_step, shard_state
    from hgr_tpu.train.state import create_train_state

    mesh = make_mesh(mesh_shape)
    model = MultiTaskNet(image_size=(image, image),
                         fused_attention=fused_attention)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, image, image, 3),
        lr=1e-3, milestones_steps=(10_000,))
    state = shard_state(state, mesh, tensor_parallel)
    step = make_parallel_train_step(
        mesh, AugmentConfig(), state,
        image_size=(image, image), heatmap_size=(image // 4, image // 4),
        tensor_parallel=tensor_parallel)

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
    key = jax.random.PRNGKey(7)
    with mesh:
        sharded = shard_batch(host_batch, mesh)
        key_d = jax.device_put(
            key, jax.sharding.NamedSharding(mesh,
                                            jax.sharding.PartitionSpec()))
        state, metrics = step(state, sharded, key_d)  # compile + warm
        loss0 = float(metrics["total_loss"])
        times = []
        for _ in range(steps):
            t0 = time.time()
            state, metrics = step(state, sharded, key_d)
            jax.block_until_ready(metrics["total_loss"])
            times.append(time.time() - t0)
    med = float(np.median(times))
    return med, loss0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--image", type=int, default=96)
    p.add_argument("--canvas", type=int, default=128)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--devices", type=int, default=8)
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{args.devices}").strip()
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    n = args.devices
    configs = [
        ("DP {data:%d}, packed fused" % n,
         {"data": n}, True, False),
        ("TP {data:%d, model:2}, XLA chain (pre-split fallback)" % (n // 2),
         {"data": n // 2, "model": 2}, False, True),
        ("TP {data:%d, model:2}, split fused" % (n // 2),
         {"data": n // 2, "model": 2}, "split", True),
    ]
    results = []
    for name, mesh_shape, fused, tp in configs:
        med, loss = _measure(mesh_shape, fused, tp, args.batch, args.image,
                             args.canvas, args.steps)
        results.append((name, med, loss))
        print(f"{name}: {med * 1e3:.0f} ms/step loss={loss:.4f}")

    base = results[0][1]
    losses = [r[2] for r in results]
    spread = max(losses) - min(losses)
    print(f"loss agreement across modes: max-min = {spread:.2e}")
    for name, med, _ in results[1:]:
        print(f"  {name}: {med / base:.2f}x DP")


if __name__ == "__main__":
    main()
