"""Real-chip numeric proof for the split-operand attention kernel.

Re-runnable source of the BENCH_LOG "TP meshes keep the fused
attention" parity numbers (fwd 5.4e-4 / bwd 1.2e-3 at 8 heads, fwd
4.8e-4 / bwd 6.2e-4 at the TP=2 local 4-head group). Three checks:

(a) ``fused_attention_split``'s fwd + bwd Mosaic kernels
    (`ops/attention_pallas.py:_split_fwd_impl/_split_bwd_impl`) lower
    on the current default platform and match the XLA attention chain;
(b) the LOCAL-HEAD-GROUP shape a TP=2 device would actually run
    (heads=4, inner=128) lowers and matches too — this is the shard
    ``ops/partitioning.py:head_partitioned`` hands each device;
(c) the public ``fused_attention_split`` entry agrees with the chain.

The comparison runs at the model's own default MXU precision (the
in-VMEM kernel matmuls use the same precision as the XLA path);
BENCH_LOG records 6.5e-3 against an f32 HIGHEST-precision oracle.

Run on the TPU (default platform): ``python -m
hgr_tpu.tools.split_attention_realchip``. On CPU the same script
exercises the interpret-free XLA fallback instead of Mosaic.
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hgr_tpu.ops.attention_pallas import (
        _split_bwd_impl,
        _split_fwd_impl,
        _xla_attention_core,
        fused_attention_split,
        merge_heads,
        split_heads,
    )

    D = 32
    N = 145
    SCALE = D ** -0.5

    def chain(q, k, v, heads):
        qh, kh, vh = split_heads(jnp.concatenate([q, k, v], -1), heads, D)
        return merge_heads(_xla_attention_core(qh, kh, vh, SCALE))

    for heads, tag in ((8, "full (8 heads)"), (4, "local TP=2 group (4 heads)")):
        hd = heads * D
        rng = np.random.RandomState(heads)
        q, k, v = (jnp.asarray(rng.randn(16, N, hd), jnp.float32)
                   for _ in range(3))
        want = jax.jit(lambda q, k, v: chain(q, k, v, heads))(q, k, v)
        got = jax.jit(lambda q, k, v: _split_fwd_impl(
            q, k, v, heads, D, SCALE))(q, k, v)
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"{tag}: fwd max|diff| = {err:.2e}")
        assert err < 2e-3, tag

        g = jnp.asarray(rng.randn(16, N, hd), jnp.float32)
        dq, dk, dv = jax.jit(lambda q, k, v, g: _split_bwd_impl(
            q, k, v, g, heads, D, SCALE))(q, k, v, g)
        wq, wk, wv = jax.jit(jax.grad(
            lambda q, k, v: jnp.vdot(chain(q, k, v, heads), g),
            argnums=(0, 1, 2)))(q, k, v)
        errs = [float(jnp.max(jnp.abs(a - b)))
                for a, b in ((dq, wq), (dk, wk), (dv, wv))]
        print(f"{tag}: bwd max|diff| = {max(errs):.2e}")
        assert max(errs) < 5e-3, tag

    # public API entry (single device -> direct kernel branch)
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(8, N, 256), jnp.float32)
               for _ in range(3))
    out = jax.jit(lambda q, k, v: fused_attention_split(
        q, k, v, 8, D, SCALE))(q, k, v)
    ref = jax.jit(lambda q, k, v: chain(q, k, v, 8))(q, k, v)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"public fused_attention_split on "
          f"{jax.devices()[0].platform}: max|diff| = {err:.2e}")
    assert err < 2e-3
    print("SPLIT_KERNEL_REAL_CHIP_OK")


if __name__ == "__main__":
    main()
