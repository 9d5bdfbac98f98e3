"""KNet — blur-kernel covariance estimator (reference: networks/KNet.py).

Head: conv 9x9 stride 4 (no bias); body: ``num_blocks`` residual blocks with
channel attention; tail: conv3x3 + global average pooling to 3 channels
interpreted as (λ1, λ2, ρ) with λ = exp(clamp(·, log 1e-4, log 1e2)) and
ρ = tanh(·)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import conv, lrelu

LOG_MAX = math.log(1e2)
LOG_MIN = math.log(1e-4)


class CALayer(nn.Module):
    nf: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(-3, -2), keepdims=True)
        y = conv(self.nf // self.reduction, 1, self.nf, name="squeeze")(y)
        y = lrelu(y, 0.2)
        y = conv(self.nf, 1, self.nf // self.reduction, name="excite")(y)
        return x * jax.nn.sigmoid(y)


class RBLayer(nn.Module):
    nf: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = conv(self.nf, 3, self.nf, name="conv1")(x)
        y = lrelu(y, 0.2)
        y = conv(self.nf, 3, self.nf, name="conv2")(y)
        y = CALayer(self.nf, name="ca")(y)
        return y + x


class KernelNet(nn.Module):
    out_chn: int = 3
    nf: int = 64
    num_blocks: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, H, W, C) -> kinfo (N, 3): (λ1, λ2, ρ)."""
        h = conv(self.nf, 9, x.shape[-1], stride=4, padding=4, bias=False,
                 name="head")(x)
        for ii in range(self.num_blocks):
            h = RBLayer(self.nf, name=f"rb_{ii}")(h)
        h = conv(self.out_chn, 3, self.nf, name="tail")(h)
        out = jnp.mean(h, axis=(-3, -2))                       # N x 3
        lam12 = jnp.exp(jnp.clip(out[:, :2], LOG_MIN, LOG_MAX))
        rho = jnp.tanh(out[:, -1:])
        return jnp.concatenate([lam12, rho], axis=1)
