"""Shared building blocks for the flax models.

All models are NHWC (TPU-native conv layout).  Initializers replicate the
torch defaults the reference trains with, so training dynamics match:
  * plain convs: kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for both
    kernel and bias (torch nn.Conv2d default);
  * DnCNN convs: orthogonal with leaky-relu(0.25) gain, zero bias
    (reference networks/DnCNN.py:46-52).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..precision import get_compute_dtype, get_precision, get_quant_mode


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(±1/sqrt(fan_in)) for HWIO conv kernels — torch Conv2d default."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def orthogonal_gain_init(gain: float) -> Callable:
    return jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)


def leaky_relu_gain(negative_slope: float) -> float:
    """torch nn.init.calculate_gain('leaky_relu', slope)."""
    return math.sqrt(2.0 / (1.0 + negative_slope ** 2))


def conv(features: int, kernel: int, in_features: int, *, stride: int = 1,
         padding: int | None = None, bias: bool = True, name: str | None = None,
         kernel_init=None, bias_init=None) -> nn.Module:
    """nn.Conv with explicit torch-style 'same-ish' integer padding and
    torch-default initializers."""
    if padding is None:
        padding = kernel // 2
    fan_in = kernel * kernel * in_features
    if kernel_init is None:
        kernel_init = torch_kernel_init
    if bias_init is None:
        bias_init = make_torch_bias_init(fan_in)
    if (get_quant_mode() == "int8" and stride == 1
            and padding == kernel // 2
            and min(features, in_features) >= 16):
        # int8 serving path (ops/qconv.py): W8A8 on the MXU's 2x-peak
        # integer pipeline.  Narrow convs (sigma-map heads, 3-channel
        # tails, CA squeeze) stay float — their emitters are not
        # MXU-bound and their dynamic range matters most.
        return QuantConv(features, kernel, in_features, stride=stride,
                         use_bias=bias, kernel_init=kernel_init,
                         bias_init=bias_init, name=name)
    if (kernel == 3 and stride == 1 and padding == 1
            and resolve_dx_impl() == "fwdstyle"):
        # training-graph opt-in: identical forward, dX emitted in the
        # forward conv form (ops/conv_vjp.py; chip A/B in BASELINE.md)
        return FwdDxConv(features, kernel, in_features, use_bias=bias,
                         kernel_init=kernel_init, bias_init=bias_init,
                         name=name)
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        use_bias=bias,
        kernel_init=kernel_init,
        bias_init=bias_init,
        precision=get_precision(),
        dtype=get_compute_dtype(),   # None -> param dtype (fp32)
        name=name,
    )


def lrelu(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=slope)


class ConvParams(nn.Module):
    """Declares the parameters of a conv (same names, shapes, and init
    draws as ``conv(features, ...)`` — HWIO 'kernel' + 'bias' under this
    module's name) and returns them, for paths that run the convolution
    through a custom kernel (ops/pallas_conv.py) instead of nn.Conv.
    Checkpoints are interchangeable between the two implementations."""
    features: int
    kernel: int
    in_features: int
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self):
        kshape = (self.kernel, self.kernel, self.in_features, self.features)
        fan_in = self.kernel * self.kernel * self.in_features
        k = self.param("kernel", self.kernel_init or torch_kernel_init,
                       kshape)
        b = self.param("bias",
                       self.bias_init or make_torch_bias_init(fan_in),
                       (self.features,))
        cdt = get_compute_dtype()
        if cdt is not None:
            k = k.astype(cdt)
            b = b.astype(cdt)
        return k, b


def resolve_conv_impl(impl: str) -> str:
    """'auto' -> 'xla'; explicit values pass through.  Opt in to the
    Pallas pixel-pair conv path with VIRNET_TPU_PALLAS_CONV=1.

    Why 'xla' wins for now (same-session v5e A/B, flagship denoise
    32x256^2 bf16): plain XLA 91.9 ms/apply vs pair-fused 93.8 / pair
    per-op 93.1.  The fused Pallas DnCNN itself runs 2x faster than
    XLA's 64-channel emitters (4.9-5.8 ms vs ~10), but the custom-call
    boundary forces layout materialization around it that costs more
    than the kernel saves (details: BASELINE.md 'pixel-pair conv
    postmortem').  The kernels stay available (conv_impl='pair') for
    shapes where the stack dominates the surrounding graph."""
    if impl != "auto":
        return impl
    import os

    import jax as _jax
    if (os.environ.get("VIRNET_TPU_PALLAS_CONV")
            and _jax.default_backend() == "tpu"):
        return "pair"
    if os.environ.get("VIRNET_TPU_SNET_SCAN"):
        # SNet mid convs as one lax.scan over stacked weights (one XLA
        # tiling decision for the identical convs — models/dncnn.py)
        return "scan"
    return "xla"


def train_conv_impl() -> str:
    """conv_impl for TRAINING graphs: same env opt-ins as
    resolve_conv_impl('auto'), except the Pallas pixel-pair kernels are
    forward-only (ops/pallas_conv.py has no VJP) and fall back to 'xla'."""
    impl = resolve_conv_impl("auto")
    return "xla" if impl.startswith("pair") else impl


def train_remat(default: bool = False) -> bool:
    """Whether training graphs rematerialize RNet blocks in the backward
    (models/attresunet.py remat).  ``VIRNET_TPU_REMAT=1|0`` overrides the
    config flag (A/B tooling: tools/bench_remat.py)."""
    import os

    v = os.environ.get("VIRNET_TPU_REMAT")
    if v is None:
        return default
    return v not in ("0", "false", "False")


def resolve_dx_impl() -> str:
    """'fwdstyle' routes every stride-1 SAME 3x3 conv through
    ops/conv_vjp.conv3x3_same_fwddx, whose dX is emitted as a plain
    forward-form conv (materialized flipped/transposed kernel) instead
    of XLA's `01oi`+rhs_reversal form.  Motivation: the round-5 chip
    profile measured dX fusions 10-13 points of MXU peak below their
    same-shape forward convs (tools/profile_backward.py).  Opt-in:
    VIRNET_TPU_DX_IMPL=fwdstyle."""
    import os

    v = os.environ.get("VIRNET_TPU_DX_IMPL", "").strip().lower()
    return "fwdstyle" if v == "fwdstyle" else "default"


class FwdDxConv(nn.Module):
    """Drop-in for ``conv(features, 3, in_features)`` (stride 1, SAME)
    whose backward dX uses the forward-style emitter (ops/conv_vjp.py).
    Parameter tree is identical to nn.Conv — names 'kernel' (HWIO) and
    'bias' — so checkpoints interchange with the default path."""
    features: int
    kernel: int
    in_features: int
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.conv_vjp import conv3x3_same_fwddx

        kshape = (self.kernel, self.kernel, self.in_features, self.features)
        k = self.param("kernel", self.kernel_init or torch_kernel_init,
                       kshape)
        cdt = get_compute_dtype()
        if cdt is None:
            cdt = jnp.promote_types(x.dtype, k.dtype)
        k = k.astype(cdt)
        x = x.astype(cdt)
        y = conv3x3_same_fwddx(x, k, get_precision())
        if self.use_bias:
            fan_in = self.kernel * self.kernel * self.in_features
            b = self.param("bias",
                           self.bias_init or make_torch_bias_init(fan_in),
                           (self.features,))
            if cdt is not None:
                b = b.astype(cdt)
            y = y + b
        return y


class QuantConv(nn.Module):
    """Drop-in for ``conv(features, ...)`` running the W8A8 int8 path
    (ops/qconv.py).  Parameter tree is identical to nn.Conv — names
    'kernel' (HWIO) and 'bias' — so any checkpoint loads unchanged; the
    quantization is purely an apply-time transform.  Output is cast to
    the compute dtype (or the input dtype) like the float path."""
    features: int
    kernel: int
    in_features: int
    stride: int = 1
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.qconv import conv_w8a8

        kshape = (self.kernel, self.kernel, self.in_features, self.features)
        fan_in = self.kernel * self.kernel * self.in_features
        k = self.param("kernel", self.kernel_init or torch_kernel_init,
                       kshape)
        b = (self.param("bias",
                        self.bias_init or make_torch_bias_init(fan_in),
                        (self.features,))
             if self.use_bias else None)
        y = conv_w8a8(x, k, b, stride=self.stride)
        out_dtype = get_compute_dtype() or x.dtype
        return y.astype(out_dtype)


class PadOutConv(nn.Module):
    """3x3 conv whose few-output-channel head is computed at a wider,
    MXU-friendly output width and sliced back — bit-exact (the pad channels
    carry zero weights/bias and are discarded).

    Motivation (measured on v5e): XLA lowers a conv with C_out in {1,3} via
    a batch-in-lanes emitter that runs ~100x off ideal (the RNet tail took
    6.3 ms of a 94 ms forward; SNet's conv_last 1.6 ms).  Computing the same
    conv at pad_to output channels (zero-padded weights, sliced back) picks
    the normal emitter.

    Parameter tree is identical to ``conv(features, ...)`` — names 'kernel'
    (HWIO, true features) and 'bias' — so checkpoints are unaffected.
    """
    features: int
    kernel: int
    in_features: int
    pad_to: int = 8
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kshape = (self.kernel, self.kernel, self.in_features, self.features)
        fan_in = self.kernel * self.kernel * self.in_features
        k = self.param("kernel", self.kernel_init or torch_kernel_init,
                       kshape)
        b = self.param("bias",
                       self.bias_init or make_torch_bias_init(fan_in),
                       (self.features,))
        cdt = get_compute_dtype()
        if cdt is not None:
            k = k.astype(cdt)
            b = b.astype(cdt)
        pad = max(self.pad_to, self.features) - self.features
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad)))
        p = self.kernel // 2
        y = jax.lax.conv_general_dilated(
            x, kp, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=get_precision(),
            preferred_element_type=x.dtype)
        return y[..., :self.features] + b
