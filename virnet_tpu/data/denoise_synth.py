"""On-device synthetic-noise generation for denoising training.

In-graph analogue of the reference's per-item CPU synthesis
(datasets/DenoisingDatasets.py:190-253): a whole batch of per-sample σ-maps
and noise fields is generated from one jax.random key inside the jitted
train step — no host round trip, no DataLoader workers.

Per sample (mode='niid'):
  center ~ U(0, p)^2, scale ~ U(p/4, 3p/4)
  bump(i, j) = exp(-((i-ch)^2 + (j-cw)^2) / (2 scale^2))
  up, down ~ U(0, 75/255) (swapped so up >= down), up += 5/255
  σ-map = down + normalize01(bump) * (up - down)
mode='iid': a single σ ~ U(0, 75/255) per sample.
Noise: ε ~ N(0, 1) * σ-map; σ²-map is clamped at 1e-10.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

SIGMA_MAX = 75.0 / 255.0


def generate_sigma_niid(key: jax.Array, batch: int,
                        patch: int) -> jnp.ndarray:
    k_center, k_scale, k_updown = jax.random.split(key, 3)
    center = jax.random.uniform(k_center, (batch, 2), minval=0.0,
                                maxval=patch)
    scale = jax.random.uniform(k_scale, (batch, 1, 1),
                               minval=patch / 4, maxval=patch / 4 * 3)
    ud = jax.random.uniform(k_updown, (batch, 2), maxval=SIGMA_MAX)
    up = jnp.maximum(ud[:, 0], ud[:, 1]) + 5.0 / 255.0
    down = jnp.minimum(ud[:, 0], ud[:, 1])

    ii = jnp.arange(patch, dtype=jnp.float32)[None, :, None]
    jj = jnp.arange(patch, dtype=jnp.float32)[None, None, :]
    ch = center[:, 0][:, None, None]
    cw = center[:, 1][:, None, None]
    bump = jnp.exp((-(ii - ch) ** 2 - (jj - cw) ** 2) / (2 * scale ** 2))

    lo = bump.min(axis=(1, 2), keepdims=True)
    hi = bump.max(axis=(1, 2), keepdims=True)
    norm = (bump - lo) / (hi - lo)
    sigma = (down[:, None, None]
             + norm * (up - down)[:, None, None])
    return sigma[..., None]                                    # N x p x p x 1


def generate_sigma_iid(key: jax.Array, batch: int, patch: int) -> jnp.ndarray:
    level = jax.random.uniform(key, (batch, 1, 1, 1), maxval=SIGMA_MAX)
    return jnp.broadcast_to(level, (batch, patch, patch, 1))


def synthesize_noisy_batch(key: jax.Array, im_gt: jnp.ndarray,
                           mode: str = "niid",
                           clip: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(key, GT batch NHWC) -> (noisy batch, σ² map (N,p,p,1) clamped)."""
    batch, patch = im_gt.shape[0], im_gt.shape[1]
    k_sigma, k_noise = jax.random.split(key)
    if mode == "niid":
        sigma = generate_sigma_niid(k_sigma, batch, patch)
    elif mode == "iid":
        sigma = generate_sigma_iid(k_sigma, batch, patch)
    else:
        raise ValueError("mode must be 'niid' or 'iid'")

    noise = jax.random.normal(k_noise, im_gt.shape, im_gt.dtype) * sigma
    im_noisy = im_gt + noise
    if clip:
        im_noisy = jnp.clip(im_noisy, 0.0, 1.0)
    sigma2 = jnp.maximum(sigma ** 2, 1e-10)
    return im_noisy, sigma2
