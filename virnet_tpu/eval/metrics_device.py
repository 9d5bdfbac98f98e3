"""Batched on-device PSNR/SSIM (jnp) matching the MATLAB protocol.

The host metrics (eval/metrics.py) are the golden scorers; these batched
versions run the same math on device for high-volume evaluation (SIDD's
1280 blocks, per-epoch validation) — one jit call per batch instead of a
cv2 round trip per image.  They reproduce the protocol:

  * uint8 round trip emulated with round-half-to-even (jnp.round == rint);
  * 11x11 σ=1.5 Gaussian window, BORDER_REFLECT_101 (= jnp 'reflect'),
    5-px valid crop, per-channel mean (reference utils/util_image.py:17-66);
  * optional Y-channel conversion + border crop.

Agreement with the host scorers is ~1e-4 dB / 1e-6 SSIM (fp32 vs fp64).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.color import rgb2ycbcr
from ..precision import get_precision

_C1 = (0.01 * 255) ** 2
_C2 = (0.03 * 255) ** 2


def quantize_uint8(x: jnp.ndarray) -> jnp.ndarray:
    """Emulate the img_as_ubyte round trip in float: clip -> *255 ->
    round-half-even -> clip."""
    return jnp.clip(jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0), 0.0, 255.0)


@lru_cache(maxsize=4)
def _ssim_window() -> np.ndarray:
    k = np.arange(11, dtype=np.float64) - 5
    g = np.exp(-(k ** 2) / (2 * 1.5 ** 2))
    g /= g.sum()
    return np.outer(g, g)


def _filter11(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.filter2D(window, BORDER_REFLECT_101) then 5px valid crop, on an
    (N, H, W, C) array — depthwise conv with 'reflect' padding."""
    n, h, w, c = x.shape
    win = jnp.asarray(_ssim_window(), dtype=x.dtype)
    xp = jnp.pad(x, ((0, 0), (5, 5), (5, 5), (0, 0)), mode="reflect")
    kg = jnp.tile(win[:, :, None, None], (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        xp, kg, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=get_precision(),
    )
    # full 'same' result then the reference's [5:-5, 5:-5] valid crop
    return out[:, 5:-5, 5:-5, :]


@partial(jax.jit, static_argnames=("border", "ycbcr"))
def batch_psnr_device(img: jnp.ndarray, clean: jnp.ndarray,
                      border: int = 0, ycbcr: bool = False) -> jnp.ndarray:
    """(N, H, W, C) float [0,1] -> (N,) PSNR after uint8 emulation."""
    a = quantize_uint8(img)
    b = quantize_uint8(clean)
    if ycbcr:
        a = quantize_uint8(rgb2ycbcr(a / 255.0, True))
        b = quantize_uint8(rgb2ycbcr(b / 255.0, True))
    if border > 0:
        a = a[:, border:-border, border:-border]
        b = b[:, border:-border, border:-border]
    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse))


@partial(jax.jit, static_argnames=("border", "ycbcr"))
def batch_ssim_device(img: jnp.ndarray, clean: jnp.ndarray,
                      border: int = 0, ycbcr: bool = False) -> jnp.ndarray:
    """(N, H, W, C) float [0,1] -> (N,) MATLAB-equivalent SSIM."""
    a = quantize_uint8(img)
    b = quantize_uint8(clean)
    if ycbcr:
        a = quantize_uint8(rgb2ycbcr(a / 255.0, True))
        b = quantize_uint8(rgb2ycbcr(b / 255.0, True))
    if border > 0:
        a = a[:, border:-border, border:-border]
        b = b[:, border:-border, border:-border]

    mu1 = _filter11(a)
    mu2 = _filter11(b)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _filter11(a * a) - mu1_sq
    sigma2_sq = _filter11(b * b) - mu2_sq
    sigma12 = _filter11(a * b) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1_sq + mu2_sq + _C1) * (sigma1_sq + sigma2_sq + _C2))
    # per-channel mean then channel mean (reference calculate_ssim)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
