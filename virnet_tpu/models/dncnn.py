"""SNet — a plain DnCNN-style conv stack that predicts the log noise
variance (reference: networks/DnCNN.py:8-52).

conv3x3 -> LeakyReLU(0.25) repeated ``dep`` times, 64 filters, orthogonal
init with leaky-relu gain and zero bias; optional global average pooling to
a per-image scalar (SISR's ``noise_avg``)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import (PadOutConv, conv, leaky_relu_gain, lrelu,
                     orthogonal_gain_init)


class DnCNN(nn.Module):
    out_channels: int
    dep: int = 5
    num_filters: int = 64
    noise_avg: bool = False
    slope: float = 0.25
    pad_narrow: int = 0   # compute the 1/3-channel conv_last at this output
                          # width (bit-exact slice; common.PadOutConv)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = orthogonal_gain_init(leaky_relu_gain(self.slope))
        zeros = nn.initializers.zeros_init()
        in_chn = x.shape[-1]

        x = conv(self.num_filters, 3, in_chn, name="conv1",
                 kernel_init=init, bias_init=zeros)(x)
        x = lrelu(x, self.slope)
        for ii in range(1, self.dep - 1):
            x = conv(self.num_filters, 3, self.num_filters,
                     name=f"mid_{ii}", kernel_init=init, bias_init=zeros)(x)
            x = lrelu(x, self.slope)
        if self.pad_narrow > self.out_channels:
            x = PadOutConv(self.out_channels, 3, self.num_filters,
                           pad_to=self.pad_narrow, kernel_init=init,
                           bias_init=zeros, name="conv_last")(x)
        else:
            x = conv(self.out_channels, 3, self.num_filters,
                     name="conv_last", kernel_init=init, bias_init=zeros)(x)
        if self.noise_avg:
            x = jnp.mean(x, axis=(-3, -2), keepdims=True)
        return x
