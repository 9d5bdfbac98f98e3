"""Degradation operators: per-sample blur, downsampling, noise estimation.

The SISR ELBO differentiates through blur + downsample every step
(reference: utils/util_sisr.py:127-144 inside loss/ELBO_simple.py:55-59), so
the in-graph path must be fast on TPU: the per-sample blur turns the kernel
taps into banded-matrix matmul contractions on the MXU (see
blur_per_sample), and the bicubic downsample is two dense matmuls
(ops/resize.py).

Padding-semantics parity notes (both reproduced deliberately):
  * in-graph path pads with true 'reflect' (torch F.pad reflect);
  * the host data path pads with 'symmetric' (edge-repeating), because the
    reference data pipeline uses scipy.ndimage.convolve(mode='reflect'),
    which is numpy 'symmetric'.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..precision import get_precision
from .resize import resize_nhwc, resize_np


@lru_cache(maxsize=32)
def _shift_bands(k: int, w_padded: int, w_out: int) -> np.ndarray:
    """Constant (k, w_padded, w_out) stack of shifted identity bands:
    bands[dj, j + dj, j] = 1."""
    bands = np.zeros((k, w_padded, w_out), dtype=np.float32)
    for dj in range(k):
        bands[dj, dj:dj + w_out, :] += np.eye(w_out, dtype=np.float32)
    return bands


def blur_per_sample(x: jnp.ndarray, kernels: jnp.ndarray,
                    correlate: bool = True,
                    pad_mode: str = "reflect",
                    impl: str = "auto") -> jnp.ndarray:
    """Blur each batch element with its own kernel ('same', padded).

    TPU-first formulation: XLA lowers a grouped conv with
    feature_group_count = N*C catastrophically on TPU (each 1-wide group
    pads to the full 128-lane width; a 21x21 per-sample blur took ~0.4 s
    AND ~280 s to compile).  Instead the kernel taps become a *matmul
    contraction*: for each kernel row di, the row-shifted image
    x[:, di:di+H] is multiplied by a per-sample banded matrix
    B_di (W+2p, W) whose bands carry w[n, di, :].  That is k batched
    matmuls on the MXU — ~20x more FLOPs than the stencil but >100x
    faster in practice, with gradients that are themselves matmuls.

    Args:
        x: (N, H, W, C) images.
        kernels: (N, k, k) kernels.
        correlate: True = cross-correlation (torch convNd semantics, the
            reference's in-loss path); False = true convolution (kernel
            flipped, scipy semantics).
        pad_mode: 'reflect' (torch F.pad) or 'symmetric' (scipy).
        impl: 'auto' | 'pallas' | 'matmul'.  'auto' picks the Pallas
            kernels (ops/pallas_blur.py: MXU banded-matmul for training
            shapes, VPU static stencil for large planes; ~4-30x faster
            than the XLA matmul form) on TPU and the matmul formulation
            elsewhere.
    Returns:
        (N, H, W, C) blurred images.
    """
    n, h, w, c = x.shape
    k = kernels.shape[-1]
    if not correlate:
        kernels = jnp.flip(kernels, axis=(-2, -1))
    kernels = kernels.astype(x.dtype)

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "matmul"
    if impl == "pallas":
        from .pallas_blur import blur_per_sample_pallas
        return blur_per_sample_pallas(x, kernels, pad_mode)

    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode=pad_mode)

    bands = jnp.asarray(_shift_bands(k, w + 2 * pad, w), dtype=x.dtype)
    prec = get_precision()
    acc = jnp.zeros((n, h, w, c), dtype=x.dtype)
    for di in range(k):
        # per-sample banded matrix for this kernel row: (N, W+2p, W)
        b_di = jnp.einsum("nd,dpw->npw", kernels[:, di, :], bands,
                          precision=prec)
        # contract the padded width axis: (N, H, W+2p, C) x (N, W+2p, W)
        acc = acc + jnp.einsum("nhpc,npw->nhwc", xp[:, di:di + h], b_di,
                               precision=prec)
    return acc


def blur_shared(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Blur all batch elements and channels with one shared (k, k) kernel
    (reflect-padded, 'same', correlation — the kernel is symmetric in every
    use here)."""
    n, h, w, c = x.shape
    k = kernel.shape[-1]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kg = jnp.broadcast_to(kernel[:, :, None, None].astype(x.dtype),
                          (k, k, 1, 1))
    kg = jnp.tile(kg, (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        xp, kg,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=get_precision(),
    )
    return out


def downsample(x: jnp.ndarray, sf: int, method: str = "direct") -> jnp.ndarray:
    """Downsample NHWC by integer factor: 'direct' stride or antialiased
    'bicubic' (ResizeRight semantics)."""
    method = method.lower()
    if method == "direct":
        return x[:, ::sf, ::sf, :]
    if method == "bicubic":
        return resize_nhwc(x, scale_factors=1.0 / sf)
    raise ValueError(f"unknown downsampler: {method}")


def degrade_batch(x_hr: jnp.ndarray, kernels: jnp.ndarray, sf: int,
                  downsampler: str = "bicubic",
                  correlate: bool = True) -> jnp.ndarray:
    """In-graph degradation: per-sample blur then downsample.  Matches the
    reference loss-side degradation (utils/util_sisr.py:127-144)."""
    return downsample(blur_per_sample(x_hr, kernels, correlate=correlate),
                      sf, downsampler)


def noise_estimate(im_noisy: jnp.ndarray, im_gt: jnp.ndarray,
                   k_size: int) -> jnp.ndarray:
    """σ²-prior for real data: Gaussian filter of the squared residual with
    the OpenCV default σ rule, clamped >= 1e-10 (reference
    utils/util_denoising.py:24-63)."""
    from .kernels import gaussian_filter_kernel

    kernel = jnp.asarray(gaussian_filter_kernel(k_size), dtype=im_noisy.dtype)
    err2 = (im_noisy - im_gt) ** 2
    prior = blur_shared(err2, kernel)
    return jnp.clip(prior, min=1e-10)


# ---------------------------------------------------------------------------
# Host-side twins (numpy / scipy) for seeded eval-data synthesis
# ---------------------------------------------------------------------------

def imconv_np(im: np.ndarray, kernel: np.ndarray,
              padding_mode: str = "reflect",
              correlate: bool = False) -> np.ndarray:
    """scipy.ndimage-style image convolution (reference
    utils/util_sisr.py:110-125).  scipy's 'reflect' is edge-repeating."""
    import scipy.ndimage as snd

    if kernel.ndim != im.ndim:
        kernel = kernel[:, :, np.newaxis]
    if correlate:
        return snd.correlate(im, kernel, mode=padding_mode)
    return snd.convolve(im, kernel, mode=padding_mode)


def degrade_np(im_hr: np.ndarray, kernel: np.ndarray, sf: int,
               nlevel: float = 2.55, qf: Optional[int] = None,
               seed: int = 1234, downsampler: str = "direct") -> np.ndarray:
    """Seeded eval degradation: blur -> clip -> downsample -> Gaussian noise
    -> optional JPEG; bit-compatible with the reference
    (utils/util_sisr.py:146-177)."""
    im_blur = imconv_np(im_hr, kernel, padding_mode="reflect", correlate=False)
    im_blur = np.clip(im_blur, 0.0, 1.0)

    if downsampler.lower() == "direct":
        im_lr = im_blur[::sf, ::sf]
    elif downsampler.lower() == "bicubic":
        im_lr = resize_np(im_blur, scale_factors=1 / sf, axes=(0, 1))
    else:
        raise ValueError("downsampler must be 'direct' or 'bicubic'")

    rng = np.random.default_rng(seed)
    im_lr = im_lr + rng.standard_normal(size=im_lr.shape) * (nlevel / 255.0)
    im_lr = np.clip(im_lr.astype(np.float32), 0.0, 1.0)

    if qf is not None:
        from .color import jpeg_compress
        im_lr = jpeg_compress(im_lr, qf=int(qf), chn_in="rgb")
    return im_lr
