"""Pallas kernels under mesh (GSPMD) programs — ops/partitioning.py.

GSPMD cannot partition Mosaic custom calls by itself; the kernels route
through batch-dim custom_partitioning whenever the process is
multi-device. These tests run the kernels in interpret mode on the
8-virtual-device CPU mesh with batch-sharded inputs and pin equality
with the unsharded result — validating the partition rules themselves
(Mosaic-vs-interpret equality is pinned by the other kernel tests).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hgr_tpu.ops.attention_pallas import (
    _attention_qkv_bwd_impl,
    _attention_qkv_impl,
    _sharded_bwd,
    _sharded_fwd,
)
from hgr_tpu.ops.warp_pallas import _sharded_warp_chunk, _warp_chunk_impl
from hgr_tpu.parallel.mesh import make_mesh

H, D, N = 8, 32, 145
SCALE = D**-0.5


def _mesh():
    return make_mesh({"data": len(jax.devices())})


def test_attention_fwd_partitioned_matches_single():
    mesh = _mesh()
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(16, N, 3 * H * D), jnp.float32)
    want = _attention_qkv_impl(qkv, H, D, SCALE, True)

    op = _sharded_fwd(H, D, SCALE, True)
    sharded = jax.device_put(qkv, NamedSharding(mesh, P("data")))
    got = jax.jit(op)(sharded)
    assert got.shape == (16, N, H * D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_attention_bwd_partitioned_matches_single():
    mesh = _mesh()
    rng = np.random.RandomState(1)
    qkv = jnp.asarray(rng.randn(8, N, 3 * H * D), jnp.float32)
    g = jnp.asarray(rng.randn(8, N, H * D), jnp.float32)
    want = _attention_qkv_bwd_impl(qkv, g, H, D, SCALE, True)

    op = _sharded_bwd(H, D, SCALE, True)
    sh = NamedSharding(mesh, P("data"))
    got = jax.jit(op)(jax.device_put(qkv, sh), jax.device_put(g, sh))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_warp_chunk_partitioned_matches_single():
    mesh = _mesh()
    rng = np.random.RandomState(2)
    b, s = 8, 128
    chw = jnp.asarray(rng.randint(0, 255, (b, 3, s, s)), jnp.float32)
    theta = 0.3
    # params rows: alpha beta gamma s2 t2 u2 + 4 jitter slots (unused)
    params = jnp.tile(jnp.asarray(
        [[np.cos(theta), np.sin(theta) * 0.2, 4.0,
          0.1, 1.05, -2.0, 0, 0, 0, 0]], np.float32), (b, 1))
    # "want" at per-shard granularity: XLA's FMA fusion of the position
    # polynomial varies with batch size, flipping floor() at
    # boundary-exact positions (the documented ~1-LSB-at-hard-edges
    # behavior of the two-pass method) — so batch-8-at-once is not
    # bitwise comparable to eight batch-1 lowerings. Partitioning must
    # reproduce the per-shard lowering exactly.
    ow = 96  # output window < canvas (the round-3 kernel resamples
    # only the output extent; _out_extent pads Y to full chunks)
    want = np.concatenate([
        np.asarray(_warp_chunk_impl(params[i:i + 1], chw[i:i + 1],
                                    ow_x=ow, ow_y=ow,
                                    with_jitter=False, interpret=True))
        for i in range(b)])

    op = _sharded_warp_chunk(ow, ow, False, True)
    sh = NamedSharding(mesh, P("data"))
    got = jax.jit(op)(jax.device_put(params, sh), jax.device_put(chw, sh))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_warp_chunk_packed_partitioned_matches_single():
    """The channel-packed kernel's own sharding rule
    ('b p, b s t -> b c y x' — the packed operand is rank 3) must
    reproduce the per-shard lowering exactly, like the planar rule."""
    mesh = _mesh()
    rng = np.random.RandomState(4)
    b, s = 8, 128
    u = rng.randint(0, 255, (b, s, s, 3)).astype(np.int64)
    packed = jnp.asarray(
        u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16), jnp.int32)
    theta = 0.3
    params = jnp.tile(jnp.asarray(
        [[np.cos(theta), np.sin(theta) * 0.2, 4.0,
          0.1, 1.05, -2.0, 0, 0, 0, 0]], np.float32), (b, 1))
    ow = 96
    want = np.concatenate([
        np.asarray(_warp_chunk_impl(params[i:i + 1], packed[i:i + 1],
                                    ow_x=ow, ow_y=ow, with_jitter=False,
                                    interpret=True, packed=True))
        for i in range(b)])

    op = _sharded_warp_chunk(ow, ow, False, True, True)
    sh = NamedSharding(mesh, P("data"))
    got = jax.jit(op)(jax.device_put(params, sh),
                      jax.device_put(packed, sh))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_attention_grad_through_mesh_jit():
    """End-to-end: value_and_grad of a mesh-jitted loss whose forward
    and backward both cross the partitioned kernel launchers."""
    from hgr_tpu.ops.attention_pallas import fused_attention_qkv

    mesh = _mesh()
    rng = np.random.RandomState(3)
    qkv = jnp.asarray(rng.randn(8, N, 3 * H * D), jnp.float32)

    def loss(qkv):
        return jnp.sum(jnp.sin(fused_attention_qkv(qkv, H, D, SCALE, True)))

    want_v, want_g = jax.value_and_grad(loss)(qkv)

    sh = NamedSharding(mesh, P("data"))
    got_v, got_g = jax.jit(jax.value_and_grad(loss),
                           in_shardings=sh)(jax.device_put(qkv, sh))
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Head-sharded split-operand attention (tensor-parallel meshes) —
# ops/partitioning.py:head_partitioned + attention_pallas.fused_attention_split.
# Under a {data, model} mesh the q/k/v feature dims shard contiguously on
# 'model'; each device must run the SAME kernel on its local head group
# and reproduce the full-head result exactly (attention has no cross-head
# math).


def _tp_mesh():
    n = len(jax.devices())
    return make_mesh({"data": 2, "model": n // 2})


def test_attention_split_fwd_tp_matches_single():
    from hgr_tpu.ops.attention_pallas import _sharded_split_fwd

    mesh = _tp_mesh()
    rng = np.random.RandomState(5)
    qkv = jnp.asarray(rng.randn(8, N, 3 * H * D), jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    want = _attention_qkv_impl(qkv, H, D, SCALE, True)

    op = _sharded_split_fwd(H, D, SCALE, True)
    sh = NamedSharding(mesh, P("data", None, "model"))
    got = jax.jit(op)(jax.device_put(q, sh), jax.device_put(k, sh),
                      jax.device_put(v, sh))
    assert got.shape == (8, N, H * D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_attention_split_bwd_tp_matches_single():
    from hgr_tpu.ops.attention_pallas import (_sharded_split_bwd,
                                              _split_bwd_impl)

    mesh = _tp_mesh()
    rng = np.random.RandomState(6)
    qkv = jnp.asarray(rng.randn(4, N, 3 * H * D), jnp.float32)
    g = jnp.asarray(rng.randn(4, N, H * D), jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    want = _split_bwd_impl(q, k, v, g, H, D, SCALE, True)

    op = _sharded_split_bwd(H, D, SCALE, True)
    sh = NamedSharding(mesh, P("data", None, "model"))
    got = jax.jit(op)(jax.device_put(q, sh), jax.device_put(k, sh),
                      jax.device_put(v, sh), jax.device_put(g, sh))
    assert len(got) == 3
    for gi, wi in zip(got, want):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                   atol=1e-5, rtol=1e-5)


def test_attention_split_grad_through_tp_mesh_jit():
    """value_and_grad of a TP-mesh-jitted loss through the split kernel
    matches the unsharded XLA attention chain (forward AND gradients)."""
    from hgr_tpu.ops.attention_pallas import (_xla_attention_core,
                                              fused_attention_split,
                                              merge_heads, split_heads)

    mesh = _tp_mesh()
    rng = np.random.RandomState(7)
    qkv = jnp.asarray(rng.randn(4, N, 3 * H * D), jnp.float32)
    q0, k0, v0 = jnp.split(qkv, 3, axis=-1)

    def loss_split(q, k, v):
        out = fused_attention_split(q, k, v, H, D, SCALE, True)
        return jnp.sum(jnp.sin(out))

    def loss_chain(q, k, v):
        qh, kh, vh = split_heads(jnp.concatenate([q, k, v], -1), H, D)
        return jnp.sum(jnp.sin(
            merge_heads(_xla_attention_core(qh, kh, vh, SCALE))))

    want_v, want_g = jax.value_and_grad(loss_chain, argnums=(0, 1, 2))(
        q0, k0, v0)

    sh = NamedSharding(mesh, P("data", None, "model"))
    args = tuple(jax.device_put(t, sh) for t in (q0, k0, v0))
    got_v, got_g = jax.jit(
        jax.value_and_grad(loss_split, argnums=(0, 1, 2)),
        in_shardings=(sh, sh, sh))(*args)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
    for gi, wi in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                   atol=1e-5, rtol=1e-5)


def test_model_split_mode_matches_chain_outputs():
    """Plumbing: MultiTaskNet(fused_attention='split') produces the same
    outputs as the unfused chain (on CPU the split core routes through
    its XLA fallback — this pins the vit.Attention wiring, shapes, and
    param-tree compatibility of the mode)."""
    from hgr_tpu.models.multitasknet import MultiTaskNet

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    m_split = MultiTaskNet(image_size=(64, 64), fused_attention="split")
    m_chain = MultiTaskNet(image_size=(64, 64), fused_attention=False)
    variables = m_split.init(jax.random.PRNGKey(0), x, train=False,
                             need_attnmap=False)
    cs, hs, _ = m_split.apply(variables, x, train=False, need_attnmap=False)
    cc, hc, _ = m_chain.apply(variables, x, train=False, need_attnmap=False)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(cc),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hc),
                               atol=1e-5, rtol=1e-5)


def test_partitioner_actually_invokes_callbacks():
    """CALLBACK_COUNTS must move when a mesh jit partitions the wrapped
    kernels: this is the evidence the 1-device real-chip drive CANNOT
    produce (XLA skips the SPMD partitioner at 1 partition —
    tools/sharded_onechip.py HONESTY NOTE), so the virtual mesh pins it."""
    from hgr_tpu.ops import partitioning
    from hgr_tpu.ops.attention_pallas import _sharded_split_fwd

    mesh = _tp_mesh()
    rng = np.random.RandomState(9)
    qkv = jnp.asarray(rng.randn(4, N, 3 * H * D), jnp.float32)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sh = NamedSharding(mesh, P("data", None, "model"))

    before = dict(partitioning.CALLBACK_COUNTS)
    op = jax.jit(_sharded_split_fwd(H, D, SCALE, True))
    out = op(jax.device_put(q, sh), jax.device_put(k, sh),
             jax.device_put(v, sh))
    out.block_until_ready()
    after = partitioning.CALLBACK_COUNTS
    assert after["head.partition"] > before.get("head.partition", 0), (
        "the SPMD partitioner never invoked head_partitioned.partition "
        "on an 8-device mesh — the sharding rule is not engaging")
