"""HLO-op-level attribution of the B=1024 train step (VERDICT r3 #3).

Round 3 attributed the backward at MODULE granularity (tools/
bwd_attribution.py: backbone bwd 137 ms = 3.6x its 38 ms forward) and
declared the residual ~1.8x-over-theory excess "intrinsic" without
op-level evidence. This tool captures a real device trace of the train
step with jax.profiler and joins the per-op durations (the device
plane's "XLA Ops" line) against the optimized HLO's per-instruction
``metadata={op_name=...}`` provenance, so the excess is reconciled
against NAMED ops (filter-grad convs vs input-grad convs vs BN-coupling
fusions vs layout changes), not asserted.

Round 3 believed per-op device traces were unavailable through the axon
tunnel; they are not — jax.profiler's xplane carries a full
``/device:TPU:0`` plane here, parsed in-process via
jax.profiler.ProfileData (see BENCH_LOG round 4).

Usage:
  python -m hgr_tpu.tools.hlo_attribution [--batch 1024] [--steps 3] \
      [--top 30] [--json out.json] [--mode train|fwd]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import tempfile

_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+) = ")
_METADATA_RE = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')
_EVNAME_RE = re.compile(r"^%?([\w.\-]+) = ")


def hlo_provenance(hlo_text: str) -> dict:
    """instruction name -> jax op_name metadata, from optimized HLO."""
    prov = {}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        md = _METADATA_RE.search(line)
        if md:
            prov[m.group(1)] = md.group(1)
    return prov


def classify(name: str, provenance: str) -> str:
    """Bucket an XLA op by fusion name + jax op provenance into the
    categories the round-3 module attribution argued about."""
    p = (provenance or "").lower()
    n = (name or "").lower()
    is_bwd = "transpose(" in p
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in p:
        return "pallas-kernel"
    if "convolution" in n or "conv_general_dilated" in p:
        # jax tags conv grads via the transpose scope; the filter grad
        # contracts over the batch dim (lowered with batch_group_count)
        if "batch_group_count" in n or "grad_rhs" in p:
            return "bwd-conv-filter"
        if is_bwd:
            return "bwd-conv-input/filter"
        return "fwd-conv"
    if "dot" in n:
        return "bwd-matmul" if is_bwd else "fwd-matmul"
    if "batch_norm" in p or "/bn" in p or "normalize" in p:
        return "bwd-bn" if is_bwd else "fwd-bn"
    if "reduce" in n:
        return "bwd-reduce" if is_bwd else "fwd-reduce"
    if n.startswith(("copy", "transpose", "bitcast", "reshape")):
        return "layout/copy"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    if "fusion" in n:
        return "bwd-fusion" if is_bwd else "fwd-fusion"
    return "other"


def parse_trace(logdir: str, steps: int):
    """Aggregate per-op durations from the TPU plane's XLA Ops lines."""
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise RuntimeError(f"no xplane.pb under {logdir}")
    data = ProfileData.from_file(paths[-1])
    planes = [pl for pl in data.planes if "/device:TPU" in pl.name]
    if not planes:
        raise RuntimeError("no /device:TPU plane; planes = "
                           + ", ".join(pl.name for pl in data.planes))
    ops = collections.defaultdict(lambda: {"total_ns": 0.0, "count": 0,
                                           "text": ""})
    module_ns = 0.0
    for plane in planes:
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    module_ns += ev.duration_ns
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = _EVNAME_RE.match(ev.name)
                key = m.group(1) if m else ev.name[:80]
                rec = ops[key]
                rec["total_ns"] += ev.duration_ns
                rec["count"] += 1
                if not rec["text"]:
                    rec["text"] = ev.name[:400]
    return ops, module_ns


def report(ops, module_ns, prov, steps, top, json_path="", meta=None):
    total_ms = sum(r["total_ns"] for r in ops.values()) / 1e6
    by_cat = collections.defaultdict(float)
    rows = []
    for name, r in ops.items():
        p = prov.get(name, "")
        cat = classify(r["text"] or name, p)
        ms = r["total_ns"] / 1e6
        by_cat[cat] += ms
        rows.append({"op": name, "category": cat,
                     "total_ms": round(ms, 3),
                     "ms_per_step": round(ms / steps, 3),
                     "count": r["count"], "provenance": p[:220]})
    rows.sort(key=lambda r: -r["total_ms"])

    print(f"\n== {len(ops)} device ops, {total_ms/steps:.1f} ms/step "
          f"op-sum ({module_ns/1e6/steps:.1f} ms/step module wall) ==")
    print(f"{'ms/step':>8}  {'category':<22} op  |  jax provenance")
    for r in rows[:top]:
        print(f"{r['ms_per_step']:>8.3f}  {r['category']:<22} "
              f"{r['op'][:46]}\n{'':>34}{r['provenance'][:130]}")
    print("\n== by category (ms/step) ==")
    for cat, ms in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{ms/steps:>8.3f}  {cat}")

    if json_path:
        with open(json_path, "w") as f:
            json.dump({"meta": meta or {},
                       "module_ms_per_step": module_ns / 1e6 / steps,
                       "opsum_ms_per_step": total_ms / steps,
                       "by_category_ms_per_step":
                       {k: round(v / steps, 3) for k, v in by_cat.items()},
                       "ops": rows}, f, indent=1)
        print("wrote", json_path)
    return rows, by_cat


def capture(args, logdir: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hgr_tpu.models import MultiTaskNet, layers
    from hgr_tpu.ops.losses import multitask_loss
    from hgr_tpu.train.state import create_train_state
    from hgr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.bn_dtype:
        layers._BN_DTYPE = (jnp.bfloat16 if args.bn_dtype == "bfloat16"
                            else jnp.float32)
    B = args.batch
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, 192, 192, 3), jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, 19, (B,)), jnp.int32)
    t = jnp.asarray(rng.rand(B, 21, 48, 48), jnp.float32)  # NCHW targets
    tw = jnp.ones((B, 21, 1), jnp.float32)

    model = MultiTaskNet(dtype=jnp.bfloat16)
    state, _ = create_train_state(
        model, jax.random.PRNGKey(0), (1, 192, 192, 3), lr=1e-3,
        milestones_steps=(10**6,))
    bstats = state.batch_stats

    def full_loss(p, xb, yb, tb, twb):
        (cls_out, hmap, _), _ = model.apply(
            {"params": p, "batch_stats": bstats}, xb, train=True,
            need_attnmap=False, mutable=["batch_stats"])
        from hgr_tpu.models.multitasknet import heatmaps_to_nchw

        total, _ = multitask_loss(cls_out, heatmaps_to_nchw(hmap),
                                  yb, tb, twb)
        return total

    fn_traced = (jax.grad(full_loss) if args.mode == "train"
                 else full_loss)
    lowered = jax.jit(fn_traced).lower(state.params, x, y, t, tw)
    compiled = lowered.compile()
    with open(os.path.join(logdir, "hlo.txt"), "w") as f:
        f.write(compiled.as_text())

    def run():
        out = compiled(state.params, x, y, t, tw)
        jax.block_until_ready(out)

    run()
    run()
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            run()
    print("trace captured to", logdir)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--json", type=str, default="")
    ap.add_argument("--logdir", type=str, default="",
                    help="parse an existing capture dir (with hlo.txt) "
                         "instead of capturing")
    ap.add_argument("--mode", type=str, default="train",
                    choices=["train", "fwd"])
    ap.add_argument("--bn_dtype", type=str, default="",
                    choices=["", "float32", "bfloat16"],
                    help="pin the BN normalize-chain dtype for the capture")
    args = ap.parse_args()

    logdir = args.logdir
    if not logdir:
        logdir = tempfile.mkdtemp(prefix="hlo_attr_")
        capture(args, logdir)

    hlo_path = os.path.join(logdir, "hlo.txt")
    prov = {}
    if os.path.exists(hlo_path):
        prov = hlo_provenance(open(hlo_path).read())
    ops, module_ns = parse_trace(logdir, args.steps)
    report(ops, module_ns, prov, args.steps, args.top, args.json,
           meta={"batch": args.batch, "mode": args.mode,
                 "bn_dtype": args.bn_dtype, "logdir": logdir})


if __name__ == "__main__":
    main()
