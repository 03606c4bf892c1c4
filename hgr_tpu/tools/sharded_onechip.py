"""Run the SHARDED train step on a 1-device mesh on the real TPU.

VERDICT r2 Missing #3 / Next #4 (first half): the Pallas kernels'
``custom_partitioning`` rules (`hgr_tpu/ops/partitioning.py`) were only
ever exercised in interpret mode on the virtual CPU mesh. This tool
drives the mesh code path — jit with NamedShardings over a 1-device
mesh — through the REAL TPU compiler.

HONESTY NOTE (correcting the first round-3 run of this tool): on a
single-device process ``multi_device()`` is False, so the kernels take
their direct-impl branch and the custom_partitioning wrappers are NOT
in the graph — the original run proved "mesh-jitted step with Pallas
kernels lowers on the real compiler", not "custom_partitioning lowers".
``--force_partitioned`` sets HGR_TPU_FORCE_PARTITIONED=1 BEFORE the
model is built, which puts the wrappers in the graph even on one
device; afterwards the tool reports ``partitioning.CALLBACK_COUNTS`` so
the output states exactly which callbacks the partitioner invoked.

``--attention split`` additionally drives the head-sharded
split-operand attention (ops/partitioning.py:head_partitioned) over a
``{data:1, model:1}`` mesh with the TP param rules applied — the same
routing ``cli/train.py --mesh data=N,model=M`` uses.

Prints per-step loss, steady-state step time, crops/s, and the
callback counts.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--image", type=int, default=192)
    p.add_argument("--canvas", type=int, default=256)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--attention", choices=["packed", "split"],
                   default="packed")
    p.add_argument("--force_partitioned", action="store_true",
                   help="route the kernels through their "
                        "custom_partitioning wrappers even on one device")
    args = p.parse_args()

    if args.force_partitioned:
        os.environ["HGR_TPU_FORCE_PARTITIONED"] = "1"

    import jax
    import jax.numpy as jnp

    from hgr_tpu.config import AugmentConfig
    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.parallel.mesh import make_mesh, shard_batch
    from hgr_tpu.parallel.steps import make_parallel_train_step, shard_state
    from hgr_tpu.train.state import create_train_state

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev} "
          f"attention={args.attention} "
          f"force_partitioned={args.force_partitioned}")

    split = args.attention == "split"
    mesh = make_mesh({"data": 1, "model": 1} if split else {"data": 1})
    image, canvas, batch = args.image, args.canvas, args.batch

    model = MultiTaskNet(image_size=(image, image), dtype=jnp.bfloat16,
                         fused_attention="split" if split else True)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, image, image, 3),
        lr=1e-3, milestones_steps=(10_000,))
    state = shard_state(state, mesh, tensor_parallel=split)

    step = make_parallel_train_step(
        mesh, AugmentConfig(), state,
        image_size=(image, image),
        heatmap_size=(image // 4, image // 4))

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
            key, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        # compile + warmup
        t0 = time.time()
        state, metrics = step(state, sharded, key_d)
        jax.block_until_ready(metrics["total_loss"])
        print(f"compile+first step: {time.time() - t0:.1f}s "
              f"loss={float(metrics['total_loss']):.4f}")

        times = []
        for i in range(args.steps):
            t0 = time.time()
            state, metrics = step(state, sharded, key_d)
            jax.block_until_ready(metrics["total_loss"])
            times.append(time.time() - t0)
        med = float(np.median(times))
        print(f"sharded 1-device-mesh step B={batch}: {med * 1e3:.1f} ms "
              f"-> {batch / med:.0f} crops/s "
              f"final_loss={float(metrics['total_loss']):.4f}")

    from hgr_tpu.ops import partitioning
    counts = dict(partitioning.CALLBACK_COUNTS)
    if counts:
        print(f"custom_partitioning callback counts: {counts}")
        print("custom_partitioning lowered + ran through the real "
              "compiler OK")
    else:
        print("custom_partitioning callbacks NEVER FIRED: the wrappers "
              "were not in the graph (multi_device()==False without "
              "--force_partitioned) or the partitioner skipped them "
              "on this mesh")


if __name__ == "__main__":
    main()
