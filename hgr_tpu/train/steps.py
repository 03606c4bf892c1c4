"""Jitted train/eval steps with fused device-side augmentation + metrics.

One compiled graph does what the reference splits across CPU workers,
the GPU forward, and per-step host syncs (reference train.py:58-107):
augment -> forward -> joint loss -> backward -> AdamW update -> on-device
F1/PCK/confusion accumulation. Only scalar metrics leave the device.

Loss semantics: total = 0.001 * CE + JointsMSE (reference train.py:63-64).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from hgr_tpu.config import AugmentConfig
from hgr_tpu.data.pipeline import (
    apply_augment_batch,
    draw_augment_params,
    identity_params,
)
from hgr_tpu.ops.losses import multitask_loss
from hgr_tpu.ops.metrics import batch_macro_f1, confusion_update, pck_accuracy
from hgr_tpu.models.multitasknet import heatmaps_to_nchw
from hgr_tpu.train.state import TrainState

Array = jax.Array


def _preprocess(batch: Dict[str, Array], key: Optional[Array],
                aug_cfg: Optional[AugmentConfig], sigma: float,
                image_size, heatmap_size) -> Dict[str, Array]:
    """Raw host batch -> model-ready tensors, fully on device."""
    b = batch["canvas"].shape[0]
    train_mode = key is not None and aug_cfg is not None
    if train_mode:
        params = draw_augment_params(key, b, batch["sizes_hw"], aug_cfg)
    else:
        params = identity_params(b)
    out = apply_augment_batch(
        batch["canvas"], batch["orig_to_canvas"], batch["sizes_hw"],
        batch["joints"], batch["joints_vis"], params,
        image_size=image_size, heatmap_size=heatmap_size, sigma=sigma,
        enable_jitter=train_mode and aug_cfg.color_jittering)
    out["label"] = batch["label"]
    return out


def _forward_and_metrics(apply_fn, params, batch_stats, data, num_classes,
                         train: bool, class_loss_weight: float = 0.001,
                         sample_mask=None, need_attnmap: bool = False):
    # need_attnmap=False routes attention through the fused no-map Pallas
    # core (ops/attention_pallas.py); only the debug-image eval step asks
    # for the map.
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        (cls_out, hmap, attn), mutated = apply_fn(
            variables, data["image"], train=True,
            need_attnmap=need_attnmap, mutable=["batch_stats"])
        new_stats = mutated["batch_stats"]
    else:
        cls_out, hmap, attn = apply_fn(variables, data["image"],
                                       train=False,
                                       need_attnmap=need_attnmap)
        new_stats = batch_stats

    hmap_nchw = heatmaps_to_nchw(hmap)
    total, parts = multitask_loss(
        cls_out, hmap_nchw, data["label"], data["target"],
        data["target_weight"], class_loss_weight=class_loss_weight,
        sample_mask=sample_mask)
    return total, (parts, cls_out, hmap_nchw, attn, new_stats)


def _step_metrics(data, parts, cls_out, hmap, num_classes, mask):
    """Shared masked metric set; mask (B,) excludes tail-batch padding so
    epoch metrics cover every sample exactly once (the reference
    evaluates full splits, train.py:239-240 + drop_last=False loaders)."""
    pred_label = jnp.argmax(cls_out, axis=-1)
    f1 = batch_macro_f1(data["label"], pred_label, num_classes,
                        sample_mask=mask)
    _, avg_acc, cnt, _ = pck_accuracy(hmap, data["target"],
                                      sample_mask=mask)
    return {
        **{k: v for k, v in parts.items()},
        "cls_f1score": f1,
        "pose_acc": avg_acc,
        "pose_cnt": cnt,
        "valid_cnt": (jnp.sum(mask) if mask is not None
                      else jnp.float32(cls_out.shape[0])),
        "conf_update": confusion_update(
            jnp.zeros((num_classes, num_classes)), data["label"],
            pred_label, sample_mask=mask),
    }, pred_label


def resolve_grad_demix(train_cfg, model_cfg):
    """Resolve the TrainConfig.grad_demix mode
    ('auto' | 'on' | 'off' | 'batched') to False | True | 'batched'.

    'auto' = de-mixed exactly when some segment of the shared path
    computes in bf16. Evidence (BENCH_LOG round 4): across 5 paired
    seeds the plain merged bf16 backward loses a reproducible ~0.06
    test macro-F1 to the de-mixed step (reference-beating 0.268 vs
    0.193 plain / 0.205 reference). Correctness-first default;
    `--grad_demix off` restores the speed mode with the documented
    classification deficit. 'batched' is the same de-mixed math
    evaluated as one batch-2 backward (see make_train_step)."""
    mode = getattr(train_cfg, "grad_demix", "auto")
    if mode in ("on", "off", "batched"):
        return "batched" if mode == "batched" else mode == "on"
    return ("bfloat16" in (model_cfg.compute_dtype,
                           model_cfg.decoder_dtype,
                           getattr(model_cfg, "early_dtype", None)))


def make_train_step(
    aug_cfg: AugmentConfig,
    num_classes: int = 19,
    sigma: float = 2.0,
    image_size=(192, 192),
    heatmap_size=(48, 48),
    donate: bool = True,
    class_loss_weight: float = 0.001,  # reference train.py:63
    grad_accum: int = 1,
    grad_demix: bool = False,
    debug_return_grads: bool = False,  # tests: expose pre-update grads
) -> Callable:
    """Build the jitted train step.

    step(state, batch, key) -> (state, metrics) where batch is the raw
    staged host batch {canvas, orig_to_canvas, sizes_hw, joints,
    joints_vis, label}.

    ``grad_accum > 1`` runs the batch as that many sequential
    microbatches under ``lax.scan`` and applies ONE optimizer update
    from the exactly-combined gradients (masked-mean grads recombine as
    a valid-count-weighted average). Peak activation memory drops to a
    single microbatch's, so bs-1024 recipes fit beside an HBM dataset
    cache (data/device_cache.py) — the standard large-batch trade.
    Metrics combine exactly (F1 from the summed confusion; PCK as the
    (acc * cnt, cnt) accumulation the epoch loop already uses, matching
    the reference's batch accumulators, train.py:89-90). BN batch
    statistics are per-microbatch (momentum applied per microbatch,
    like the reference's bs-32 steps at the same total throughput).

    ``grad_demix=True`` computes the two task gradients by SEPARATE
    cotangent pullbacks through ONE shared linearization (jax.vjp):
    ``g = g_joints + class_loss_weight * g_ce`` combined in float32 at
    the parameter level. Mathematically identical to backprop of the
    summed loss (the pullback is linear in the cotangent) — but under
    bf16 compute it is NOT numerically identical, and that is the
    point: the CE-x-0.001 classification cotangent (reference
    train.py:63) is ~2^-10 of the pose-dominated cotangent magnitudes,
    so every bf16 rounding of the MERGED stream drowns it in
    quantization noise (round-4 bisection: f32 test-F1 0.296 vs bf16
    0.145 on the shared fixture, pose identical; f32-decoder-only and
    f32-backbone-only both fail to recover, because the merged stream
    crosses bf16 somewhere in each). De-mixed, each backward carries a
    single task's cotangents at full relative precision in bf16. Cost:
    one extra backward pass (the forward/linearization is shared).

    ``grad_demix='batched'`` evaluates the SAME two pullbacks as one
    ``jax.vmap`` of the pullback over a 2-row cotangent basis — one
    batch-2 backward instead of two backwards. Identical math and the
    same single-task-per-row precision property (the rows never add
    inside the backward; the f32 combine at the parameter level is
    unchanged). The win is memory traffic: every saved residual
    activation and every weight is read ONCE by the batched backward
    ops instead of once per pullback, attacking the HBM-bound share of
    the demix overhead (BENCH_LOG round 5 A/B).
    """
    demix_batched = grad_demix == "batched"
    grad_demix = bool(grad_demix)

    def train_step(state: TrainState, batch: Dict[str, Array], key: Array):
        def _one_micro(params, stats, mbatch, mkey):
            mask = mbatch.get("valid")
            data = _preprocess(mbatch, mkey, aug_cfg, sigma, image_size,
                               heatmap_size)

            if grad_demix:
                return _demixed_micro(params, stats, data, mask)

            def loss_fn(p):
                return _forward_and_metrics(
                    state.apply_fn, p, stats, data, num_classes,
                    train=True, class_loss_weight=class_loss_weight,
                    sample_mask=mask)

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (total, (parts, cls_out, hmap, attn, new_stats)), grads = (
                grad_fn(params))
            metrics, _ = _step_metrics(data, parts, cls_out, hmap,
                                       num_classes, mask)
            return grads, new_stats, metrics

        def _demixed_micro(params, stats, data, mask):
            from hgr_tpu.ops.losses import (classification_loss,
                                            joints_mse_loss)

            def fwd(p):
                variables = {"params": p, "batch_stats": stats}
                (cls_out, hmap, _), mutated = state.apply_fn(
                    variables, data["image"], train=True,
                    need_attnmap=False, mutable=["batch_stats"])
                hmap_nchw = heatmaps_to_nchw(hmap)
                # NATURAL-scale CE (weight applied at the f32 combine
                # below, so the pullback's cotangents are O(1))
                ce = classification_loss(cls_out, data["label"], mask)
                jl = joints_mse_loss(hmap_nchw, data["target"],
                                     data["target_weight"], mask)
                return (ce, jl), (cls_out, hmap_nchw,
                                  mutated["batch_stats"])

            ((ce, jl), vjp_fn, (cls_out, hmap_nchw, new_stats)) = jax.vjp(
                fwd, params, has_aux=True)
            one, zero = jnp.float32(1.0), jnp.float32(0.0)
            if demix_batched:
                # both pullbacks as ONE batch-2 backward: rows are the
                # cotangent basis [(1,0), (0,1)]; residuals/weights are
                # read once (see make_train_step docstring)
                (g2,) = jax.vmap(vjp_fn)(
                    (jnp.stack([one, zero]), jnp.stack([zero, one])))
                grads = jax.tree_util.tree_map(
                    lambda g: (g[1].astype(jnp.float32)
                               + class_loss_weight
                               * g[0].astype(jnp.float32)), g2)
            else:
                (g_ce,) = vjp_fn((one, zero))
                (g_jl,) = vjp_fn((zero, one))
                grads = jax.tree_util.tree_map(
                    lambda a, b: (b.astype(jnp.float32)
                                  + class_loss_weight
                                  * a.astype(jnp.float32)),
                    g_ce, g_jl)
            class_loss = ce * class_loss_weight
            parts = {"total_loss": class_loss + jl,
                     "class_loss": class_loss, "joints_loss": jl}
            metrics, _ = _step_metrics(data, parts, cls_out, hmap_nchw,
                                       num_classes, mask)
            return grads, new_stats, metrics

        if grad_accum == 1:
            grads, new_stats, metrics = _one_micro(
                state.params, state.batch_stats, batch, key)
            if debug_return_grads:
                metrics["_grads"] = grads
            return state.apply_gradients(grads, new_stats), metrics

        from hgr_tpu.ops.metrics import macro_f1_from_confusion

        a = grad_accum
        b = next(iter(batch.values())).shape[0]
        assert b % a == 0, f"batch {b} not divisible by grad_accum {a}"
        micro = {k: v.reshape((a, b // a) + v.shape[1:])
                 for k, v in batch.items()}
        keys = jax.random.split(key, a)

        def body(carry, xs):
            stats, gsum, vsum, psum, conf, pnum, pcnt = carry
            mbatch, k = xs
            grads, new_stats, m = _one_micro(state.params, stats, mbatch, k)
            v = m["valid_cnt"]
            gsum = jax.tree_util.tree_map(
                lambda g_, s_: s_ + g_.astype(jnp.float32) * v, grads, gsum)
            psum = {name: psum[name] + m[name] * v
                    for name in ("total_loss", "class_loss", "joints_loss")}
            return (new_stats, gsum, vsum + v, psum,
                    conf + m["conf_update"],
                    pnum + m["pose_acc"] * m["pose_cnt"],
                    pcnt + m["pose_cnt"]), None

        zeros_like_f32 = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        init = (state.batch_stats, zeros_like_f32, jnp.float32(0.0),
                {"total_loss": jnp.float32(0.0),
                 "class_loss": jnp.float32(0.0),
                 "joints_loss": jnp.float32(0.0)},
                jnp.zeros((num_classes, num_classes)),
                jnp.float32(0.0), jnp.float32(0.0))
        (new_stats, gsum, vsum, psum, conf, pnum, pcnt), _ = jax.lax.scan(
            body, init, (micro, keys))

        denom = jnp.maximum(vsum, 1.0)
        grads = jax.tree_util.tree_map(lambda s_: s_ / denom, gsum)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {
            **{name: psum[name] / denom
               for name in ("total_loss", "class_loss", "joints_loss")},
            "cls_f1score": macro_f1_from_confusion(conf),
            "pose_acc": pnum / jnp.maximum(pcnt, 1.0),
            "pose_cnt": pcnt,
            "valid_cnt": vsum,
            "conf_update": conf,
        }
        if debug_return_grads:
            metrics["_grads"] = grads
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(
    num_classes: int = 19,
    sigma: float = 2.0,
    image_size=(192, 192),
    heatmap_size=(48, 48),
    return_outputs: bool = False,
    with_attnmap: Optional[bool] = None,
) -> Callable:
    """Build the jitted eval step: same forward, no augment, no update.

    eval_step(state, batch) -> metrics (plus raw outputs when
    ``return_outputs`` — used by the debug-image dumper).
    ``with_attnmap`` controls whether the outputs carry the attention
    map (defaults to ``return_outputs``); TRAIN-cadence debug dumps pass
    False so the unfused last-layer chain and the (B,8,N,N) float32
    device→host transfer are skipped for a map they never render.
    """
    if with_attnmap is None:
        with_attnmap = return_outputs

    def eval_step(state: TrainState, batch: Dict[str, Array]):
        mask = batch.get("valid")
        data = _preprocess(batch, None, None, sigma, image_size,
                           heatmap_size)
        total, (parts, cls_out, hmap, attn, _) = _forward_and_metrics(
            state.apply_fn, state.params, state.batch_stats, data,
            num_classes, train=False, sample_mask=mask,
            need_attnmap=with_attnmap)
        metrics, pred_label = _step_metrics(data, parts, cls_out, hmap,
                                            num_classes, mask)
        if return_outputs:
            return metrics, {
                "image": data["image"],
                "target": data["target"],
                "target_weight": data["target_weight"],
                "joints": data["joints"],
                "label": data["label"],
                "pred_label": pred_label,
                "heatmap": hmap,
                "attnmap": attn,
            }
        return metrics

    return jax.jit(eval_step)
