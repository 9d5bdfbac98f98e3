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

from ..precision import get_compute_dtype, get_precision


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
         kernel_init=None, bias_init=None) -> nn.Conv:
    """nn.Conv with explicit torch-style 'same-ish' integer padding and
    torch-default initializers."""
    if padding is None:
        padding = kernel // 2
    fan_in = kernel * kernel * in_features
    if kernel_init is None:
        kernel_init = torch_kernel_init
    if bias_init is None:
        bias_init = make_torch_bias_init(fan_in)
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
