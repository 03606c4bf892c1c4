"""Building-block layers: Conv+BN+SiLU, ResNet basic/bottleneck blocks.

TPU-first re-design of the reference's torch modules
(reference model/gelan.py:18-121). Differences from a literal translation:
  * NHWC layout end-to-end (TPU conv layout; torch uses NCHW).
  * Explicit symmetric padding replicating torch's ``autopad``
    (reference model/gelan.py:5-14) — flax's 'SAME' pads asymmetrically
    for stride 2, which would break weight-port parity.
  * Configurable compute dtype (bfloat16 on TPU) with float32 params and
    float32 BatchNorm statistics.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Dtype = Any

# Dtype of the BatchNorm normalize/scale elementwise chain (and hence
# the bytes its forward fusion and backward batch-stat coupling touch).
# Batch statistics themselves always accumulate in float32 inside
# flax's _compute_stats regardless of this setting. float32 is the
# faithful default; 'bfloat16' is a measured mixed-precision lever
# (A/B in BENCH_LOG) selectable via HGR_TPU_BN_DTYPE. The env var is
# read lazily at each model trace (bn_dtype()), so setting it after
# import works; tests/tools may instead pin layers._BN_DTYPE directly,
# which overrides the env var until reset to None.
_BN_DTYPE: Optional[Any] = None


def bn_dtype() -> Any:
    """Resolve the BN normalize-chain dtype: explicit _BN_DTYPE override
    if set, else the HGR_TPU_BN_DTYPE env var (read now, not at import)."""
    if _BN_DTYPE is not None:
        return _BN_DTYPE
    return (jnp.bfloat16
            if os.environ.get("HGR_TPU_BN_DTYPE", "") == "bfloat16"
            else jnp.float32)


# Fused BN(+SiLU) training epilogue routing (ops/bn_act_pallas.py): the
# hand-derived two-pass backward replaces XLA's autodiff of the BN
# normalize chain in TRAIN mode. f32-chain numerics at bf16 byte
# traffic. Same resolution pattern as _BN_DTYPE: explicit override via
# layers._FUSED_BN, else the HGR_TPU_FUSED_BN env var ('on'/'off',
# default 'auto'), read lazily at each model trace.
_FUSED_BN: Optional[bool] = None
_FUSED_BN_AUTO = False  # 'auto' verdict (see BENCH_LOG round 5 A/B)


def fused_bn() -> bool:
    """Resolve fused-BN routing: explicit _FUSED_BN override if set,
    else HGR_TPU_FUSED_BN ('on' | 'off' | 'auto'/unset)."""
    if _FUSED_BN is not None:
        return _FUSED_BN
    v = os.environ.get("HGR_TPU_FUSED_BN", "auto")
    if v in ("1", "on", "true"):
        return True
    if v in ("0", "off", "false"):
        return False
    return _FUSED_BN_AUTO


def torch_kernel_init():
    """torch Conv2d/Linear default init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (torch nn/init defaults used
    throughout the reference model/). Flax's lecun_normal default is
    1.73x wider per layer; through the ViT's unnormalized residual/pose
    path that compounds to a ~4x larger initial heatmap scale, which
    measurably slows the reference recipe's convergence (round-3
    head-to-head: initial joints loss 0.48 vs 0.05)."""
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch Conv2d/Linear default bias init: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-shape padding for odd kernels (reference model/gelan.py:5-14)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


def _conv3x3s2_plain(x, w, precision):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3s2_dense_grad(x, w, precision):
    """3x3 stride-2 conv whose INPUT gradient is computed by phase
    decomposition instead of XLA's input-dilated transposed conv.

    Forward: the plain strided conv (identical lowering, zero cost).
    Backward dx: with k=3, s=2, pad=1, even input positions receive
    exactly one tap (the center row/col) and odd positions two — so dx
    splits into four DENSE stride-1 convs over dy (kernels are slices of
    W, sizes 1x1 / 1x2 / 2x1 / 2x2), interleaved back with one reshape.
    Same multiply-add set as the dilated formulation but without the
    75%-zero wasted MXU work. dw reuses XLA's standard filter-grad
    lowering (via jax.vjp of the w-only closure).
    """
    return _conv3x3s2_plain(x, w, precision)


def _conv3x3s2_dg_fwd(x, w, precision):
    return _conv3x3s2_plain(x, w, precision), (x, w)


def _conv3x3s2_dg_bwd(precision, res, ct):
    import jax.lax as lax

    x, w = res
    dn = ("NHWC", "HWIO", "NHWC")

    def pconv(k, pad):
        return lax.conv_general_dilated(
            ct, k.astype(ct.dtype), (1, 1), pad,
            dimension_numbers=dn, precision=precision)

    wt = jnp.swapaxes(w, 2, 3)  # (t, u, O, C)
    k00 = wt[1:2, 1:2]
    k01 = jnp.stack([wt[1, 2], wt[1, 0]], axis=0)[None]      # (1,2,O,C)
    k10 = jnp.stack([wt[2, 1], wt[0, 1]], axis=0)[:, None]   # (2,1,O,C)
    k11 = jnp.stack([jnp.stack([wt[2, 2], wt[2, 0]], 0),
                     jnp.stack([wt[0, 2], wt[0, 0]], 0)], 0)  # (2,2,O,C)
    p00 = pconv(k00, ((0, 0), (0, 0)))
    p01 = pconv(k01, ((0, 0), (0, 1)))
    p10 = pconv(k10, ((0, 1), (0, 0)))
    p11 = pconv(k11, ((0, 1), (0, 1)))
    b, h, wd, c = p00.shape
    dx = jnp.stack([p00, p01, p10, p11], axis=3)
    dx = dx.reshape(b, h, wd, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    dx = dx.reshape(b, 2 * h, 2 * wd, c).astype(x.dtype)

    _, vjp_w = jax.vjp(lambda w_: _conv3x3s2_plain(x, w_, precision), w)
    dw, = vjp_w(ct)
    return dx, dw


conv3x3s2_dense_grad.defvjp(_conv3x3s2_dg_fwd, _conv3x3s2_dg_bwd)


class _DenseGradConv3x3s2(nn.Module):
    """3x3 stride-2 conv module using ``conv3x3s2_dense_grad``; the
    param keeps the reference (3, 3, Cin, Cout) shape and the
    ``conv/kernel`` tree path."""

    features: int
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init(),
                            (3, 3, c, self.features), jnp.float32)
        return conv3x3s2_dense_grad(
            x.astype(self.dtype), kernel.astype(self.dtype),
            self.precision)


class _S2DConv3x3s2(nn.Module):
    """3x3 stride-2 conv computed as space-to-depth + 2x2 stride-1 conv.

    Mathematically identical to the plain conv (same multiply-add set; the
    3x3 weights scatter into a zero-padded (2, 2, 4*Cin, Cout) kernel:
    W2[ka, kb, (p*2+q)*Cin + c, o] = W[2*ka+p-1, 2*kb+q-1, c, o], entries
    with tap index outside [0, 2] stay zero). The param keeps the
    reference (3, 3, Cin, Cout) shape and the ``conv/kernel`` tree path,
    so checkpoints/weight ports are unaffected.

    Why: XLA-TPU lowers a stride-2 conv's INPUT gradient as an
    input-dilated conv — 75% zeros, ~4x wasted MXU work. After s2d every
    conv in the network is stride-1 and every gradient is dense; the
    measured backbone backward drops accordingly (BENCH_LOG round 3,
    'Backbone backward attribution'). Standard TPU practice (MLPerf
    ResNet space-to-depth stem).
    """

    features: int
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0, (h, w)
        kernel = self.param("kernel", torch_kernel_init(),
                            (3, 3, c, self.features), jnp.float32)
        kc = kernel.astype(self.dtype)
        # One gather builds the scattered kernel: tap index d = 2*k+r-1
        # over (k, r) in {0,1}^2; out-of-range taps are masked to zero.
        d = np.arange(2)[:, None] * 2 + np.arange(2)[None, :] - 1  # (k, r)
        ok = (d >= 0) & (d <= 2)
        dc = np.clip(d, 0, 2)
        # (ka, pa, kb, qb, c, o) -> (ka, kb, pa, qb, c, o)
        w2 = kc[dc][:, :, dc] * jnp.asarray(
            ok[:, :, None, None] & ok[None, None], self.dtype
        )[..., None, None]
        w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(
            2, 2, 4 * c, self.features)
        z = x.reshape(b, h // 2, 2, w // 2, 2, c)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            z.astype(self.dtype), w2, (1, 1), ((1, 0), (1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision)


class _FusedBNAct(nn.Module):
    """Train-mode BatchNorm(+SiLU) routed through the fused two-pass
    custom backward (ops/bn_act_pallas.bn_act).

    Creates the exact flax ``nn.BatchNorm`` variable tree — params
    ``scale``/``bias``, batch_stats ``mean``/``var``, all float32 — so a
    checkpoint is route-agnostic: eval (and any run with fused BN off)
    reads the same variables through ``nn.BatchNorm``. Running-stat
    update matches flax (momentum EMA, biased batch variance, f32)."""

    use_act: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from hgr_tpu.ops.bn_act_pallas import bn_act

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        out, mean, var = bn_act(x, scale, bias, self.epsilon, self.use_act)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return out


class ConvBnAct(nn.Module):
    """conv(bias=False) + BatchNorm + activation
    (reference model/gelan.py:18-56 ``Conv``; default act SiLU).

    ``stride2_impl`` routes an eligible 3x3/stride-2 conv through an
    alternative lowering — 's2d' (space-to-depth, _S2DConv3x3s2) or
    'dense_grad' (plain forward + phase-decomposed input gradient,
    conv3x3s2_dense_grad). Same math and param tree either way."""

    features: int
    kernel_size: int = 1
    strides: int = 1
    padding: Optional[int] = None
    groups: int = 1
    dilation: int = 1
    use_act: bool = True
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    stride2_impl: str = "plain"  # 'plain' | 's2d' | 'dense_grad'

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        p = autopad(self.kernel_size, self.padding, self.dilation)
        # PTQ calibration hook (infer/quant.py): record the absmax of this
        # conv's input. Only traced when a caller passes
        # mutable=['quant_stats']; zero cost otherwise (and skipped at
        # init so the collection never leaks into fresh variable trees).
        if (not self.is_initializing()
                and self.is_mutable_collection("quant_stats")):
            self.sow(
                "quant_stats", "in_absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.zeros((), jnp.float32))
        # int8 PTQ inference branch (infer/quant.py:quantize_variables):
        # taken when the variables carry a 'quant' entry for this module.
        # BN is pre-folded into the int8 kernel + f32 bias, the input is
        # quantized against a calibrated per-tensor scale, and the conv
        # accumulates exactly in int32 on the MXU. Inference only.
        if not train and self.has_variable("quant", "kernel_q"):
            return self._quantized(x, p)
        eligible = (self.kernel_size == 3 and self.strides == 2
                    and self.groups == 1 and self.dilation == 1 and p == 1)
        if eligible and self.stride2_impl == "s2d":
            x = _S2DConv3x3s2(self.features, dtype=self.dtype,
                              precision=self.precision, name="conv")(x)
        elif eligible and self.stride2_impl == "dense_grad":
            x = _DenseGradConv3x3s2(self.features, dtype=self.dtype,
                                    precision=self.precision,
                                    name="conv")(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=(self.kernel_size, self.kernel_size),
                strides=(self.strides, self.strides),
                padding=((p, p), (p, p)),
                feature_group_count=self.groups,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                kernel_init=torch_kernel_init(),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                precision=self.precision,
                name="conv",
            )(x)
        # bf16 BN applies only under a bf16 compute dtype; under f32
        # compute the normalize chain stays f32 regardless of the knob.
        chain_dtype = (bn_dtype() if jnp.dtype(self.dtype) == jnp.bfloat16
                       else jnp.float32)
        # Fused route: train mode, f32-chain numerics only (an explicit
        # HGR_TPU_BN_DTYPE=bfloat16 request keeps the flax bf16 chain —
        # the fused backward IS the f32 chain, just cheaper).
        if (train and fused_bn()
                and jnp.dtype(chain_dtype) == jnp.float32):
            x = _FusedBNAct(use_act=self.use_act, name="bn")(x)
            return x.astype(self.dtype)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch default 0.1 <=> flax momentum 0.9
            epsilon=1e-5,
            dtype=chain_dtype,
            name="bn",
        )(x)
        if self.use_act:
            x = nn.silu(x)
        return x.astype(self.dtype)

    def _quantized(self, x: Array, p: int) -> Array:
        """int8 inference path: quantize input -> int8 conv (int32
        accumulate) -> dequant with the BN-folded scale/bias -> SiLU.

        Variables (collection 'quant', built by
        infer/quant.py:quantize_variables):
          kernel_q  (k, k, Cin, Cout) int8 — BN-folded, per-out-channel
          out_scale (Cout,) f32 — act_scale * per-channel weight scale
          act_scale ()      f32 — calibrated input scale (absmax/127)
          bias      (Cout,) f32 — BN-folded bias
        """
        assert self.groups == 1 and self.dilation == 1, (
            "int8 path supports plain convs only")
        dummy = lambda: None  # apply-time read; never initialized here
        wq = self.variable("quant", "kernel_q", dummy).value
        out_scale = self.variable("quant", "out_scale", dummy).value
        act_scale = self.variable("quant", "act_scale", dummy).value
        bias = self.variable("quant", "bias", dummy).value
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, (self.strides, self.strides), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * out_scale + bias
        if self.use_act:
            y = nn.silu(y)
        return y.astype(self.dtype)


class ResBasicBlock(nn.Module):
    """ResNet basic block (reference model/gelan.py:59-87): two 3x3
    Conv-BN blocks, SiLU between, residual add, trailing SiLU."""

    features: int
    shortcut: bool = True
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        y = ConvBnAct(self.features, 3, 1, dtype=self.dtype,
                      precision=self.precision, name="cv1")(x, train)
        y = ConvBnAct(self.features, 3, 1, use_act=False, dtype=self.dtype,
                      precision=self.precision, name="cv2")(y, train)
        if self.shortcut:
            residual = x
            if c1 != self.features:
                residual = ConvBnAct(
                    self.features, 1, 1, use_act=False, dtype=self.dtype,
                    precision=self.precision, name="downsample")(x, train)
            y = residual + y
        return nn.silu(y).astype(self.dtype)


class ResBottleneck(nn.Module):
    """ResNet bottleneck (reference model/gelan.py:90-121). Defined for
    parity with the reference inventory; unused by GELAN 'small'/'large'
    specs (SURVEY.md §2a row 4)."""

    features: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        c1 = x.shape[-1]
        c_ = int(self.features * self.expansion)
        y = ConvBnAct(c_, 1, 1, dtype=self.dtype,
                      precision=self.precision, name="cv1")(x, train)
        y = ConvBnAct(c_, 3, 1, dtype=self.dtype,
                      precision=self.precision, name="cv2")(y, train)
        y = ConvBnAct(self.features, 1, 1, use_act=False, dtype=self.dtype,
                      precision=self.precision, name="cv3")(y, train)
        # Reference: residual only when c1 == features (gelan.py:105).
        if self.shortcut and c1 == self.features:
            y = x + y
        return nn.silu(y).astype(self.dtype)
