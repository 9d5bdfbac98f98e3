"""Device-side JPEG degradation — block-DCT quantization in-graph.

The reference applies real libjpeg round trips as a SISR training noise
type (utils/util_image.py:236-257, used datasets/SISRDatasets.py:102-114).
libjpeg runs on the host, which forces the whole degradation of a JPEG
batch off-device (data/sisr_host.py).  This module implements the lossy
core of baseline JPEG as pure jnp — RGB→YCbCr, 4:2:0 chroma subsampling,
8×8 block DCT (two 8×8 matmuls per block, MXU-friendly), quantization
against the libjpeg quality-scaled standard tables, then the decode half
(dequant, IDCT, fancy chroma upsampling, YCbCr→RGB) — so the JPEG noise
branch can run inside the jitted train step with a traced per-sample
quality factor.

It is a deliberate float approximation of libjpeg, not a bit replica:
libjpeg's integer DCT, rounding biases and entropy coding are not
modeled (entropy coding is lossless, so only the integer arithmetic
differs).  Measured against cv2/libjpeg-turbo round trips on natural
images the approximation lands at 0.1–1.4/255 mean abs difference —
2–13% of the real codec's own degradation for the qf ≤ 75 range the
training tables draw from (see tests/test_jpeg.py); the host path
(`ops/color.jpeg_compress`) remains the exact-semantics option and the
default for reference-parity work.

JPEG algorithm constants follow ITU-T T.81 (the standard quantization
tables, Annex K) and libjpeg's `jpeg_quality_scaling`.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

# ITU-T T.81 Annex K base quantization tables (row-major 8x8).
_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32)

_CHROMA_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float32)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix (D @ x == DCT(x))."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2.0 / 8.0)
    d[0] /= np.sqrt(2.0)
    return d.astype(np.float32)


_DCT = _dct_matrix()


def quality_tables(quality):
    """libjpeg ``jpeg_quality_scaling`` + table build, traced-compatible.

    quality: scalar or (N,) array in [1, 100].  Returns (luma, chroma)
    tables shaped like quality + (8, 8).
    """
    q = jnp.clip(jnp.asarray(quality, jnp.float32), 1.0, 100.0)
    # libjpeg computes 5000 / quality in INTEGER arithmetic — floor it,
    # or table entries are off by one for most of the 31..49 range
    scale = jnp.where(q < 50.0, jnp.floor(5000.0 / q), 200.0 - 2.0 * q)
    scale = scale[..., None, None]

    def build(base):
        t = jnp.floor((base * scale + 50.0) / 100.0)
        return jnp.clip(t, 1.0, 255.0)

    return build(jnp.asarray(_LUMA_Q)), build(jnp.asarray(_CHROMA_Q))


def _rgb_to_ycc(rgb):
    """JPEG full-range BT.601 RGB→YCbCr on [0,255] values."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def _ycc_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b], axis=-1)


def _pad_to(x, mult):
    """Edge-replicate pad the trailing two spatial dims to a multiple."""
    h, w = x.shape[-2], x.shape[-1]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(x, pad, mode="edge")


def _blockify(plane):
    """(..., H, W) → (..., H//8, W//8, 8, 8)."""
    *lead, h, w = plane.shape
    x = plane.reshape(*lead, h // 8, 8, w // 8, 8)
    return jnp.swapaxes(x, -3, -2)


def _unblockify(blocks):
    *lead, nh, nw, _, _ = blocks.shape
    x = jnp.swapaxes(blocks, -3, -2)
    return x.reshape(*lead, nh * 8, nw * 8)


def _quantize_plane(plane, table):
    """DCT → quantize → dequantize → IDCT of one (..., H, W) plane.

    table broadcasts against the block axes: (..., 1, 1, 8, 8) after the
    expansion below, so per-sample tables work under vmap-free batching.
    """
    d = jnp.asarray(_DCT)
    blocks = _blockify(plane - 128.0)
    # HIGHEST precision regardless of the repo policy: this is a codec —
    # DCT coefficients reach ~1000, and a bf16 MXU pass would flip
    # quantization bins (the CPU-run parity tests cannot see that)
    hi = lax.Precision.HIGHEST
    coef = jnp.einsum("ij,...jk,lk->...il", d, blocks, d, precision=hi)
    if table.ndim > 2:       # per-sample (N,8,8) vs blocks (N,nh,nw,8,8)
        table = table[..., None, None, :, :]
    coef = jnp.round(coef / table) * table
    out = jnp.einsum("ji,...jk,kl->...il", d, coef, d, precision=hi)
    return _unblockify(out) + 128.0


def _downsample_420(plane):
    """2×2 box average over the trailing two dims (libjpeg h2v2 encode)."""
    *lead, h, w = plane.shape
    x = plane.reshape(*lead, h // 2, 2, w // 2, 2)
    return x.mean(axis=(-3, -1))


def _upsample_fancy_1d(x, axis):
    """libjpeg h2v2 fancy upsampling along one axis (triangle filter):
    out[2i] = (3·x[i] + x[i−1]) / 4, out[2i+1] = (3·x[i] + x[i+1]) / 4,
    edges clamped."""
    x = jnp.moveaxis(x, axis, -1)
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    nxt = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    even = (3.0 * x + prev) / 4.0
    odd = (3.0 * x + nxt) / 4.0
    out = jnp.stack([even, odd], axis=-1).reshape(*x.shape[:-1],
                                                  x.shape[-1] * 2)
    return jnp.moveaxis(out, -1, axis)


def _upsample_420(plane):
    return _upsample_fancy_1d(_upsample_fancy_1d(plane, -1), -2)


def jpeg_degrade(x, quality, subsample: bool = True):
    """JPEG round-trip degradation of float RGB images, in-graph.

    x: (..., H, W, 3) float in [0, 1] (any leading batch dims).
    quality: scalar or per-sample array broadcastable to the leading
        dims (e.g. (N,) for x of (N, H, W, 3)) in [1, 100]; may be a
        traced value.
    subsample: 4:2:0 chroma subsampling (cv2/libjpeg default).  False
        gives 4:4:4.

    Returns the degraded images, same shape/dtype domain as x.
    Matches the reference's uint8 round trip at the boundaries
    (utils/util_image.py:245-257): input is quantized to uint8 levels
    before encoding and the decoded result is returned on the uint8
    grid / 255.
    """
    x = jnp.asarray(x, jnp.float32)
    u8 = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0)
    # libjpeg stores Y/Cb/Cr samples as uint8 rows before the DCT — that
    # rounding is part of the real codec's error, so model it
    y, cb, cr = (jnp.round(c) for c in _rgb_to_ycc(u8))

    h, w = x.shape[-3], x.shape[-2]
    luma_t, chroma_t = quality_tables(quality)

    mcu = 16 if subsample else 8
    y = _pad_to(y, mcu)
    cb = _pad_to(cb, mcu)
    cr = _pad_to(cr, mcu)

    y = _quantize_plane(y, luma_t)
    if subsample:
        # the downsampled chroma plane is also stored as uint8 samples
        cb = _upsample_420(_quantize_plane(
            jnp.round(_downsample_420(cb)), chroma_t))
        cr = _upsample_420(_quantize_plane(
            jnp.round(_downsample_420(cr)), chroma_t))
    else:
        cb = _quantize_plane(cb, chroma_t)
        cr = _quantize_plane(cr, chroma_t)

    rgb = _ycc_to_rgb(y[..., :h, :w], cb[..., :h, :w], cr[..., :h, :w])
    # decoder writes uint8 samples: land on the uint8 grid like the host
    # round trip does
    return jnp.round(jnp.clip(rgb, 0.0, 255.0)) / 255.0
