"""Model tests: output shapes, parameter count, and numerical weight-port
parity against the torch reference (imported read-only from
/root/reference — skipped when unavailable).

Pinned facts from SURVEY.md §6 [measured]:
  * total params 7,409,000 (encoder 5,687,872 + proj 131,072 + ViT 1,590,056)
  * outputs: cls [B,19], heatmap [B,21,48,48], attn [B,8,145,145]
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hgr_tpu.models import MultiTaskNet
from hgr_tpu.models.multitasknet import heatmaps_to_nchw
from hgr_tpu.utils.torch_port import port_multitasknet

REFERENCE_DIR = "/root/reference"

HI = jax.lax.Precision.HIGHEST


def _init_model(**kw):
    model = MultiTaskNet(precision=HI, **kw)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)), train=False)
    return model, variables


@pytest.fixture(scope="module")
def model_and_vars():
    return _init_model()


def test_output_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(0).randn(2, 192, 192, 3),
                    jnp.float32)
    cls_out, hmap, attn = model.apply(variables, x, train=False)
    assert cls_out.shape == (2, 19)
    assert hmap.shape == (2, 48, 48, 21)
    assert heatmaps_to_nchw(hmap).shape == (2, 21, 48, 48)
    assert attn.shape == (2, 8, 145, 145)
    # attention rows are a softmax distribution
    np.testing.assert_allclose(
        np.asarray(jnp.sum(attn, axis=-1)), 1.0, atol=1e-4)


def test_param_count(model_and_vars):
    _, variables = model_and_vars
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    n_stats = sum(x.size for x in jax.tree.leaves(variables["batch_stats"]))
    # torch counts BN running stats separately from parameters; the
    # reference's 7,409,000 [measured] covers trainable params only.
    assert n_params == 7_409_000, n_params
    # every BN layer carries mean+var
    assert n_stats > 0


def test_train_mode_updates_batch_stats(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(1).randn(2, 192, 192, 3),
                    jnp.float32)
    (out, new_vars) = model.apply(
        variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(new_vars["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after))
    assert changed


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference repo not mounted")
def test_weight_port_parity():
    """Port reference weights -> identical outputs (tolerance ~1e-4 fp32)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from model.multitasknet import MultiTaskNet as TorchNet
    finally:
        sys.path.remove(REFERENCE_DIR)

    torch.manual_seed(0)
    tnet = TorchNet(21, 19, [192, 192]).eval()
    # randomize BN running stats so parity exercises them
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    variables = port_multitasknet(tnet.state_dict())
    model = MultiTaskNet(precision=HI)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 192, 192).astype(np.float32)
    with torch.no_grad():
        t_cls, t_hmap, t_attn = tnet(torch.as_tensor(x))

    j_cls, j_hmap, j_attn = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)

    np.testing.assert_allclose(
        np.asarray(j_cls), t_cls.numpy(), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(heatmaps_to_nchw(j_hmap)), t_hmap.numpy(),
        rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(j_attn), t_attn.numpy(), rtol=1e-3, atol=2e-4)


def test_gelan_feature_shape():
    from hgr_tpu.models import GELANNet

    net = GELANNet("small", precision=HI)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)))
    out = net.apply(variables, jnp.zeros((2, 192, 192, 3)))
    assert out.shape == (2, 12, 12, 512)


def test_gelan_large_builds():
    from hgr_tpu.models import GELANNet

    net = GELANNet("large", precision=HI)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    out = net.apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 4, 4, 512)


def test_bfloat16_forward(model_and_vars):
    """bf16 compute path stays numerically sane and returns f32 heads."""
    _, variables = model_and_vars
    model_bf16 = MultiTaskNet(dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 192, 192, 3),
                    jnp.float32)
    cls_out, hmap, attn = model_bf16.apply(variables, x, train=False)
    assert cls_out.dtype == jnp.float32
    assert np.isfinite(np.asarray(cls_out, np.float32)).all()
    assert np.isfinite(np.asarray(hmap, np.float32)).all()


def test_remat_exact():
    """remat is a pure memory/FLOPs trade: the param tree and
    the gradients are bit-identical to the non-remat model (the hi-res
    prefix is recomputed, not re-derived — models/gelan.py remat_hires)."""
    x = jnp.asarray(np.random.RandomState(3).randn(2, 64, 64, 3),
                    jnp.float32)
    plain = MultiTaskNet(image_size=(64, 64), precision=HI)
    remat = MultiTaskNet(image_size=(64, 64), precision=HI,
                         remat=True)
    v0 = plain.init(jax.random.PRNGKey(0), x, train=False)
    v1 = remat.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v0)
            == jax.tree_util.tree_structure(v1))

    def loss(model, variables, params):
        (cls_out, hmap, _), _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, need_attnmap=False, mutable=["batch_stats"])
        return jnp.sum(cls_out ** 2) + jnp.sum(hmap ** 2)

    g0 = jax.grad(lambda p: loss(plain, v0, p))(v0["params"])
    g1 = jax.grad(lambda p: loss(remat, v1, p))(v1["params"])
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_s2d_stride2_exact():
    """The space-to-depth lowering of the backbone's stride-2 convs
    (layers._S2DConv3x3s2) is the same math on the same param tree:
    identical init, forward equal to float noise, gradients equal to
    reduction-order noise."""
    from hgr_tpu.models import GELANNet

    x = jnp.asarray(np.random.RandomState(4).randn(2, 64, 64, 3),
                    jnp.float32)
    plain = GELANNet("small", precision=HI)
    s2d = GELANNet("small", precision=HI, stride2_impl="s2d")
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    v2 = s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    assert max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), v, v2))) == 0.0

    ya = plain.apply(v, x, train=False)
    yb = s2d.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-5)

    def loss(m, p):
        out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    ga = jax.grad(lambda p: loss(plain, p))(v["params"])
    gb = jax.grad(lambda p: loss(s2d, p))(v["params"])
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))
                           / (jnp.max(jnp.abs(a)) + 1e-12)), ga, gb)
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-4


def test_dense_grad_stride2_exact():
    """conv3x3s2_dense_grad: plain forward, phase-decomposed input
    gradient — forward identical, dx/dw match autodiff of the plain
    conv to float noise (layers.ConvBnAct stride2_impl='dense_grad')."""
    import jax.lax as lax
    from hgr_tpu.models.layers import conv3x3s2_dense_grad

    HIP = jax.lax.Precision.HIGHEST
    rng = np.random.RandomState(5)
    for h, w_, cin, cout in ((8, 8, 3, 4), (12, 16, 5, 7)):
        x = jnp.asarray(rng.randn(2, h, w_, cin), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)

        def plain(x_, w_):
            return lax.conv_general_dilated(
                x_, w_, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=HIP)

        y0 = plain(x, w)
        y1 = conv3x3s2_dense_grad(x, w, HIP)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

        ct = jnp.asarray(rng.randn(*y0.shape), jnp.float32)
        dx0, dw0 = jax.vjp(plain, x, w)[1](ct)
        dx1, dw1 = jax.vjp(
            lambda x_, w_: conv3x3s2_dense_grad(x_, w_, HIP), x, w)[1](ct)
        np.testing.assert_allclose(np.asarray(dx0), np.asarray(dx1),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dw0), np.asarray(dw1),
                                   rtol=1e-5, atol=1e-5)


def test_dense_grad_backbone_grads_match():
    """GELANNet(stride2_impl='dense_grad') gradients match the plain
    backbone's on the same params."""
    from hgr_tpu.models import GELANNet

    x = jnp.asarray(np.random.RandomState(6).randn(2, 64, 64, 3),
                    jnp.float32)
    plain = GELANNet("small", precision=HI)
    dg = GELANNet("small", precision=HI, stride2_impl="dense_grad")
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        dg.init(jax.random.PRNGKey(0), x, train=False)))

    def loss(m, p):
        out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    ga = jax.grad(lambda p: loss(plain, p))(v["params"])
    gb = jax.grad(lambda p: loss(dg, p))(v["params"])
    rel = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))
                           / (jnp.max(jnp.abs(a)) + 1e-12)), ga, gb)
    assert max(jax.tree_util.tree_leaves(rel)) < 1e-4


def test_bn_dtype_knob():
    """HGR_TPU_BN_DTYPE=bfloat16 (layers._BN_DTYPE) lowers only the BN
    normalize chain under a bf16 compute dtype: batch statistics stay
    f32, an f32-compute model is bit-identical under both settings, and
    the bf16-BN gradients track the f32-BN gradients closely (the
    knob's real-chip A/B lives in tools/bn_dtype_ab.py; BENCH_LOG
    'BN normalize-chain dtype')."""
    from hgr_tpu.models import layers

    x = jnp.asarray(np.random.RandomState(11).rand(2, 64, 64, 3),
                    jnp.float32)
    orig = layers._BN_DTYPE
    try:
        outs, grads = {}, {}
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            layers._BN_DTYPE = dt
            model = MultiTaskNet(image_size=(64, 64), dtype=jnp.bfloat16)
            v = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                           train=True)
            for leaf in jax.tree_util.tree_leaves(v["batch_stats"]):
                assert leaf.dtype == jnp.float32

            def loss(p, v=v, model=model):
                (cls_out, hmap, _), _ = model.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    x.astype(jnp.bfloat16), train=True,
                    need_attnmap=False, mutable=["batch_stats"])
                return (jnp.sum(cls_out.astype(jnp.float32) ** 2)
                        + jnp.sum(hmap.astype(jnp.float32) ** 2))

            outs[name] = float(loss(v["params"]))
            g = jax.grad(loss)(v["params"])
            grads[name] = {
                jax.tree_util.keystr(path): float(
                    jnp.sum(jnp.abs(l).astype(jnp.float32)))
                for path, l in jax.tree_util.tree_leaves_with_path(g)}
        assert np.isfinite(outs["bf16"])
        assert all(np.isfinite(x) for x in grads["bf16"].values())
        # Per-leaf L1 norms (not one global sum, where drift could cancel
        # across leaves): max relative diff over all non-tiny leaves.
        assert grads["f32"].keys() == grads["bf16"].keys()
        scale = max(grads["f32"].values())
        rels = {
            k: abs(grads["f32"][k] - grads["bf16"][k])
            / (abs(grads["f32"][k]) + 1e-9)
            for k in grads["f32"]
            if grads["f32"][k] > 1e-6 * scale  # skip ~zero-grad leaves
        }
        # Per-leaf drift is larger than the old global-sum bound (which
        # let drift cancel across leaves): observed worst ~5.5% on a BN
        # scale grad, median well under 1%. Bound both.
        worst = max(rels, key=rels.get)
        assert rels[worst] < 0.10, (worst, rels[worst])
        assert float(np.median(list(rels.values()))) < 0.02, rels

        # f32 compute: knob-immune, outputs bit-identical.
        ref = []
        for dt in (jnp.float32, jnp.bfloat16):
            layers._BN_DTYPE = dt
            m32 = MultiTaskNet(image_size=(64, 64))
            v32 = m32.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=True)
            (cls_out, hmap, _), _ = m32.apply(
                v32, x, train=True, mutable=["batch_stats"])
            ref.append((np.asarray(cls_out), np.asarray(hmap)))
        assert np.array_equal(ref[0][0], ref[1][0])
        assert np.array_equal(ref[0][1], ref[1][1])
    finally:
        layers._BN_DTYPE = orig


def test_decoder_dtype_mixed_restores_cls_grad_fidelity():
    """decoder_dtype=float32 under a bf16 backbone (the '--dtype mixed'
    training recipe): same params/structure, and the classification-head
    gradient tracks the full-f32 model far more closely than the all-bf16
    model does. Round 4 root-cause: the CE-x-0.001 cls gradient
    (reference train.py:63) is ~2^-10 of the pose-dominated cotangents,
    so a bf16 decoder backward rounds it into quantization noise —
    measured as a reproducible ~0.03 test macro-F1 deficit vs the torch
    f32 reference on the shared fixture (BENCH_LOG round 4)."""
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3),
                    jnp.float32)
    labels = jnp.asarray([1, 7])

    def grads(dtype, decoder_dtype):
        model = MultiTaskNet(image_size=(64, 64), dtype=dtype,
                             decoder_dtype=decoder_dtype)
        v = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3)), train=True)

        def loss(p):
            (cls_out, hmap, _), _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x.astype(dtype), train=True, need_attnmap=False,
                mutable=["batch_stats"])
            # cls-only loss scaled like the recipe (CE x 0.001), but
            # routed through a pose-scale additive term so the shared
            # cotangents look like training's
            logp = jax.nn.log_softmax(cls_out.astype(jnp.float32))
            ce = -jnp.mean(logp[jnp.arange(2), labels]) * 1e-3
            pose = jnp.mean(hmap.astype(jnp.float32) ** 2)
            return ce + pose

        g = jax.grad(loss)(v["params"])
        return v, g

    v32, g32 = grads(jnp.float32, None)
    _, gbf = grads(jnp.bfloat16, None)
    vmx, gmx = grads(jnp.bfloat16, jnp.float32)

    # identical parameter tree (shapes + dtypes + init) across configs
    assert jax.tree_util.tree_structure(v32["params"]) \
        == jax.tree_util.tree_structure(vmx["params"])
    for a, b in zip(jax.tree_util.tree_leaves(v32["params"]),
                    jax.tree_util.tree_leaves(vmx["params"])):
        assert a.shape == b.shape and a.dtype == b.dtype

    def cls_head_err(g):
        ref = g32["decoder"]["mlp_head_fc"]["kernel"].astype(jnp.float32)
        got = g["decoder"]["mlp_head_fc"]["kernel"].astype(jnp.float32)
        return float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))

    err_bf = cls_head_err(gbf)
    err_mx = cls_head_err(gmx)
    # mixed must land much nearer the f32 truth than all-bf16 does
    assert err_mx < 0.5 * err_bf, (err_mx, err_bf)
    assert err_mx < 0.05, err_mx
