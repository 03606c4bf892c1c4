"""int8 PTQ serving path (hgr_tpu/infer/quant.py).

Beyond-reference capability — the reference has no quantization; these
tests pin the quantization math (BN folding, exact int32 accumulation,
representable-value exactness) and the end-to-end quantized forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hgr_tpu.infer.quant import (
    calibrate_act_scales,
    quantize_model,
    quantize_variables,
)
from hgr_tpu.models import MultiTaskNet
from hgr_tpu.models.layers import ConvBnAct


def _convbn(features=16, k=3, s=2, use_act=True):
    return ConvBnAct(features, k, s, use_act=use_act, dtype=jnp.float32)


def _with_bn(variables, mean, var, scale, bias):
    v = jax.tree_util.tree_map(np.asarray, variables)
    c = v["params"]["bn"]
    c["scale"] = np.full_like(c["scale"], scale)
    c["bias"] = np.full_like(c["bias"], bias)
    s = v["batch_stats"]["bn"]
    s["mean"] = np.full_like(s["mean"], mean)
    s["var"] = np.full_like(s["var"], var)
    return v


def test_calibration_records_input_absmax():
    m = _convbn()
    x = jnp.zeros((2, 8, 8, 4))
    variables = m.init(jax.random.PRNGKey(0), x)
    assert "quant_stats" not in variables  # init must not leak the hook
    big = jnp.full((2, 8, 8, 4), -3.5)
    stats = calibrate_act_scales(m, variables, [x, big])
    assert np.isclose(float(stats["in_absmax"]), 3.5)


def test_quantized_convbn_close_to_float():
    m = _convbn()
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 16, 16, 8))
    variables = m.init(key, x)
    # give BN non-trivial folded stats
    variables = _with_bn(variables, mean=0.2, var=1.7, scale=1.3, bias=-0.1)
    ref = m.apply(variables, x)
    qvars = quantize_model(m, variables, [np.asarray(x)])
    out = m.apply(qvars, x)
    assert out.shape == ref.shape
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel  # 8-bit weights+acts on a single conv


def test_quantized_exact_on_representable_values():
    """Inputs and BN-folded weights that are exact multiples of the
    scales must round-trip the int8 path bit-exactly (int32 accumulate)."""
    m = _convbn(features=4, k=1, s=1, use_act=False)
    x0 = jnp.zeros((1, 4, 4, 4))
    variables = m.init(jax.random.PRNGKey(2), x0)
    variables = _with_bn(variables, mean=0.0, var=1.0 - 1e-5, scale=1.0,
                         bias=0.0)  # a == 1: fold is the identity
    rng = np.random.RandomState(0)
    w = rng.randint(-127, 128, size=(1, 1, 4, 4)).astype(np.float32) * 0.01
    w[0, 0, 0, :] = 1.27  # pins w_scale to exactly 0.01 on EVERY channel
    variables["params"]["conv"]["kernel"] = w
    x = (rng.randint(-127, 128, size=(2, 4, 4, 4)).astype(np.float32)
         * 0.01)
    x.flat[0] = 1.27  # pins act_scale to exactly 0.01
    ref = m.apply(variables, jnp.asarray(x))
    qvars = quantize_model(m, variables, [x])
    out = m.apply(qvars, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_quant_tree_shapes_and_dtypes():
    m = MultiTaskNet(dtype=jnp.float32)
    x = jnp.zeros((1, 192, 192, 3))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    stats = calibrate_act_scales(m, variables, [np.zeros((1, 192, 192, 3),
                                                         np.float32)],
                                 need_attnmap=False)
    qvars = quantize_variables(variables, stats)
    # every backbone ConvBnAct quantized; ViT/proj untouched
    q = qvars["quant"]
    assert set(q.keys()) == {"encoder"}
    leaves = jax.tree_util.tree_leaves_with_path(q)
    kq = [p for p, v in leaves if p[-1].key == "kernel_q"]
    assert len(kq) == 22  # 2 stem + 3 down + 3x(cv1+cv4+2 blocks x 2 convs)
    for path, v in leaves:
        name = path[-1].key
        if name == "kernel_q":
            assert v.dtype == np.int8
        else:
            assert v.dtype == np.float32
    # params/batch_stats preserved so the float path remains available
    assert qvars["params"] is variables["params"]


def test_multitasknet_quantized_forward_close():
    m = MultiTaskNet(dtype=jnp.float32)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 192, 192, 3)) * 0.5
    variables = m.init(key, x, train=False)
    logits, hmap, _ = m.apply(variables, x, train=False,
                              need_attnmap=False)
    qvars = quantize_model(m, variables, [np.asarray(x)],
                           need_attnmap=False)
    qlogits, qhmap, _ = jax.jit(
        lambda v, x: m.apply(v, x, train=False, need_attnmap=False)
    )(qvars, x)
    assert qlogits.shape == logits.shape and qhmap.shape == hmap.shape
    rel = float(jnp.linalg.norm(qlogits - logits)
                / jnp.linalg.norm(logits))
    assert rel < 0.25, rel  # random-weights bound; trained-model F1 delta
    # is measured on-chip (BENCH_LOG 'int8 PTQ serving path')
    assert np.all(np.isfinite(np.asarray(qlogits)))


def test_quantized_graph_exports_stablehlo(tmp_path):
    from hgr_tpu.infer.export import (
        export_stablehlo,
        load_stablehlo,
        make_inference_fn,
    )

    m = MultiTaskNet(dtype=jnp.float32)
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, 192, 192, 3))
    variables = m.init(key, x, train=False)
    qvars = quantize_model(m, variables, [np.asarray(x)],
                           need_attnmap=False)
    path = str(tmp_path / "quant.stablehlo")
    export_stablehlo(m, qvars, path, batch=1)
    fn = load_stablehlo(path)
    got_logits, got_hmap = fn(x)
    want_logits, want_hmap = make_inference_fn(m, qvars)(x)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_hmap),
                               np.asarray(want_hmap), atol=1e-5)


def test_missing_calibration_raises():
    with pytest.raises(ValueError):
        quantize_variables({"params": {}, "batch_stats": {}}, {})
