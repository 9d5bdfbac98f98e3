"""On-device SISR degradation synthesis for training.

In-graph analogue of the reference's CPU pipeline
(datasets/SISRDatasets.py:66-122): per-sample anisotropic Gaussian kernels,
blur, bicubic/direct downsampling and Gaussian noise are generated for the
whole batch inside the jitted train step.

Parity notes:
  * kernel sampling: λ1 ~ U(0.2, sf); λ2 ~ U(λ1, sf) w.p. 0.7 else λ1;
    θ ~ U(0, π); the *variances* fed to the covariance are λ² (the reference
    passes lambda**2, datasets/SISRDatasets.py:82-87);
  * the data-path kernel uses the numpy (x, y) coordinate convention — the
    transpose of the in-loss kernel (see ops/kernels.py docstring) — so we
    transpose the in-graph kernel to match;
  * the host pipeline pads with scipy's edge-repeating 'reflect'
    (= jnp 'symmetric') and uses true convolution (flipped kernel);
  * the JPEG noise branch runs in-graph when ``add_jpeg=True`` via the
    device-side block-DCT codec (ops/jpeg.py, a measured-close float
    approximation of libjpeg) — enabling device-resident JPEG training;
    the bit-exact libjpeg path remains host-side (data/sisr_host.py,
    data/eval_sets.py) and validation always uses it.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.degrade import downsample
from ..ops.kernels import sigma2kernel
from ..precision import get_precision


class SISRBatch(NamedTuple):
    im_hr: jnp.ndarray      # N x H x W x C
    im_lr: jnp.ndarray      # N x H/sf x W/sf x C
    im_blur: jnp.ndarray    # N x H/sf x W/sf x C (pre-noise LR)
    kinfo: jnp.ndarray      # N x 3 (s1, s2, rho) — marginal variances + corr
    nlevel: jnp.ndarray     # N x 1 noise std


def sample_kernel_params(key: jax.Array, batch: int, sf: int):
    """Sample (λ1, λ2, θ) per the reference distribution; returns the
    covariance matrices (N, 2, 2) in the *data* (x-first) convention and the
    kinfo (N, 3) = (Σ00, Σ11, ρ)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lam1 = jax.random.uniform(k1, (batch,), minval=0.2, maxval=float(sf))
    lam2_hi = jax.random.uniform(k2, (batch,), minval=0.0, maxval=1.0)
    lam2 = lam1 + lam2_hi * (float(sf) - lam1)          # U(lam1, sf)
    iso = jax.random.uniform(k3, (batch,)) >= 0.7       # w.p. 0.3: isotropic
    lam2 = jnp.where(iso, lam1, lam2)
    theta = jax.random.uniform(k4, (batch,), minval=0.0, maxval=math.pi)

    v1, v2 = lam1 ** 2, lam2 ** 2                        # variances
    c, s = jnp.cos(theta), jnp.sin(theta)
    # Σ = U diag(v1, v2) U^T with U = [[c, -s], [s, c]]
    s00 = c * c * v1 + s * s * v2
    s11 = s * s * v1 + c * c * v2
    s01 = c * s * (v1 - v2)
    cov = jnp.stack([jnp.stack([s00, s01], -1),
                     jnp.stack([s01, s11], -1)], -2)     # N x 2 x 2
    rho = s01 / (jnp.sqrt(s00) * jnp.sqrt(s11))
    kinfo = jnp.stack([s00, s11, rho], axis=-1)
    return cov, kinfo


def blur_symmetric_convolve(x: jnp.ndarray, kernels: jnp.ndarray):
    """Per-sample true convolution with scipy-compatible 'symmetric' padding
    (the host data path's semantics); MXU banded-matmul formulation
    (ops/degrade.blur_per_sample)."""
    from ..ops.degrade import blur_per_sample

    return blur_per_sample(x, kernels, correlate=False, pad_mode="symmetric")


def random_qf_device(key: jax.Array, batch: int) -> jnp.ndarray:
    """In-graph twin of the MATLAB-style JPEG quality table
    (data/sisr_host.py:random_qf, reference datasets/SISRDatasets.py:52-60):
    pick a (start, end) bucket uniformly, then an integer qf uniformly
    inside it (inclusive)."""
    start = jnp.array([30, 35, 40, 45, 60, 70, 80], jnp.float32)
    end = jnp.array([35, 40, 45, 60, 70, 80, 95], jnp.float32)
    k1, k2 = jax.random.split(key)
    ind = jax.random.randint(k1, (batch,), 0, start.shape[0])
    lo, hi = start[ind], end[ind]
    u = jax.random.uniform(k2, (batch,))
    return jnp.minimum(lo + jnp.floor(u * (hi - lo + 1.0)), hi)


def synthesize_sisr_batch(key: jax.Array, im_hr: jnp.ndarray, sf: int,
                          k_size: int = 21,
                          kernel_shift: bool = False,
                          downsampler: str = "bicubic",
                          noise_level=(0.1, 15.0),
                          add_jpeg: bool = False,
                          noise_jpeg=(0.1, 10.0)) -> SISRBatch:
    """(key, HR batch NHWC) -> degraded training batch, all on device.

    With ``add_jpeg`` each sample draws its noise type uniformly
    (reference datasets/SISRDatasets.py:102-114): Gaussian at
    U(noise_level)/255, or Gaussian at U(noise_jpeg)/255 followed by a
    JPEG round trip at a table-drawn quality (ops/jpeg.jpeg_degrade).
    ``nlevel`` returns the Gaussian std in both branches, as the
    reference does.
    """
    batch = im_hr.shape[0]
    if add_jpeg:
        k_ker, k_nl, k_noise, k_type, k_qf, k_nlj = jax.random.split(key, 6)
    else:
        # preserve the pre-jpeg RNG stream: Gaussian-only runs draw the
        # same kernels/noise for a given (seed, epoch, step) as before
        # the JPEG branch existed
        k_ker, k_nl, k_noise = jax.random.split(key, 3)

    cov, kinfo = sample_kernel_params(k_ker, batch, sf)
    # torch-convention kernel transposed == numpy/data-convention kernel
    kernels = jnp.swapaxes(
        sigma2kernel(cov, k_size, sf, shift=kernel_shift), -2, -1)

    im_blur = blur_symmetric_convolve(im_hr, kernels)
    im_blur = jnp.clip(im_blur, 0.0, 1.0)
    im_blur_lr = downsample(im_blur, sf, downsampler)

    std = jax.random.uniform(k_nl, (batch, 1, 1, 1),
                             minval=noise_level[0] / 255.0,
                             maxval=noise_level[1] / 255.0)
    if add_jpeg:
        is_jpeg = jax.random.bernoulli(k_type, 0.5, (batch,))
        std_j = jax.random.uniform(k_nlj, (batch, 1, 1, 1),
                                   minval=noise_jpeg[0] / 255.0,
                                   maxval=noise_jpeg[1] / 255.0)
        std = jnp.where(is_jpeg[:, None, None, None], std_j, std)
    noise = jax.random.normal(k_noise, im_blur_lr.shape, im_blur_lr.dtype)
    im_lr = jnp.clip(im_blur_lr + noise * std, 0.0, 1.0)
    if add_jpeg:
        from ..ops.jpeg import jpeg_degrade

        qf = random_qf_device(k_qf, batch)
        im_jpeg = jpeg_degrade(im_lr, qf)
        im_lr = jnp.where(is_jpeg[:, None, None, None], im_jpeg, im_lr)

    return SISRBatch(im_hr=im_hr, im_lr=im_lr, im_blur=im_blur_lr,
                     kinfo=kinfo, nlevel=std.reshape(batch, 1))
