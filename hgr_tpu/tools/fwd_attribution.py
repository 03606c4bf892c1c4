"""Attribute the 2-output forward's time across model sections.

BENCH_LOG round 2b pinned the B=4096 forward at ~269 ms (~68% MFU)
after the fused attention kernel, with the GELAN backbone at ~131 ms
(~90% MFU on the big convs). This tool splits the REMAINING ~138 ms
between the projection, the transformer stack, the cls head, and the
pose decoder, using the same cumulative-prefix/standalone-graph method
as tools/bwd_attribution.py (separate jits, medians, deltas — per-op
device traces are unavailable through the axon tunnel).

Graphs timed (bf16, preformed images, need_attnmap=False):
  full        full 2-output forward
  bb          GELANNet encoder only
  bb_proj     encoder + 1x1 projection (512 -> 256)
  pose        STANDALONE pose head on preformed (B, 144, 256) tokens:
              reshape -> align-corners x4 upsample (separable matmuls)
              -> ReLU -> 1x1 conv 256 -> 21   (vit.py _pose_head)
  cls         STANDALONE cls head (LayerNorm + Linear) on (B, 256)

Derived:
  proj        ~ bb_proj - bb
  transformer ~ full - bb_proj - pose - cls   (includes posemb/concat glue)

Suspect going in: the pose head materializes a (B, 48, 48, 256) bf16
intermediate (4.8 GB at B=4096) that the fused-kernel rework never
touched; its FLOPs are <3% of the model.

Usage: python -m hgr_tpu.tools.fwd_attribution [--batch 4096] [--iters 20]
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
    return float(np.median(times)) * 1000.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from hgr_tpu.models import MultiTaskNet
    from hgr_tpu.models.gelan import GELANNet
    from hgr_tpu.ops.resize import upsample_bilinear_align_corners
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    b = args.batch
    model = MultiTaskNet(dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)), train=False)
    params = variables["params"]
    bstats = variables["batch_stats"]

    img = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (b, 192, 192, 3),
                          jnp.bfloat16))
    tokens = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (b, 144, 256),
                          jnp.bfloat16))
    cls_feat = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(3), (b, 256), jnp.bfloat16))

    encoder = GELANNet("small", dtype=jnp.bfloat16)

    @jax.jit
    def f_full(x):
        return model.apply(variables, x, train=False, need_attnmap=False)

    @jax.jit
    def f_bb(x):
        return encoder.apply(
            {"params": params["encoder"], "batch_stats": bstats["encoder"]},
            x, False)

    @jax.jit
    def f_bb_proj(x):
        feats = encoder.apply(
            {"params": params["encoder"], "batch_stats": bstats["encoder"]},
            x, False)
        w = params["proj"]["kernel"].astype(jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            feats, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    pose_p = params["decoder"]["simple_decoder_conv"]

    @jax.jit
    def f_pose(t):
        hmap = t.reshape(b, 12, 12, 256)
        hmap = upsample_bilinear_align_corners(
            hmap, 4, compute_dtype=jnp.bfloat16)
        hmap = jax.nn.relu(hmap)
        out = jax.lax.conv_general_dilated(
            hmap, pose_p["kernel"].astype(jnp.bfloat16), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (out + pose_p["bias"].astype(jnp.bfloat16)).astype(jnp.float32)

    cls_p = params["decoder"]
    ln = cls_p["mlp_head_norm"]
    fc = cls_p["mlp_head_fc"]

    @jax.jit
    def f_cls(x):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        y = (x32 - mu) / jnp.sqrt(var + 1e-5) * ln["scale"] + ln["bias"]
        return y @ fc["kernel"] + fc["bias"]

    res = {}
    res["full"] = _timeit(f_full, img, iters=args.iters)
    res["bb"] = _timeit(f_bb, img, iters=args.iters)
    res["bb_proj"] = _timeit(f_bb_proj, img, iters=args.iters)
    res["pose"] = _timeit(f_pose, tokens, iters=args.iters)
    res["cls"] = _timeit(f_cls, cls_feat, iters=args.iters)

    res["derived_proj"] = res["bb_proj"] - res["bb"]
    res["derived_transformer_glue"] = (
        res["full"] - res["bb_proj"] - res["pose"] - res["cls"])
    res["batch"] = b
    res["crops_per_s_full"] = b / (res["full"] / 1000.0)
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res.items()}))


if __name__ == "__main__":
    main()
