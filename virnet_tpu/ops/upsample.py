"""Integer-factor nearest resampling and the 2x2-stride-2 transposed conv.

torch-semantics parity notes:
  * ``F.interpolate(mode='nearest')`` maps output index i to input index
    floor(i * in / out); for an integer upscale this degenerates to pixel
    repetition — implemented with ``jnp.repeat`` (no gather).
  * ``nn.ConvTranspose2d(k=2, s=2, p=0)`` writes an independent 2x2 output
    block per input pixel.  Two numerically equivalent formulations are
    kept (agree to <=1e-5 in fp32, unit-tested; <=1 uint8 level end-to-end
    on trained weights):
    ``lax.conv_transpose`` on the flipped kernel (XLA's grad-conv emitter;
    the default — measured 1.7 ms/apply faster on the flagship forward
    because it avoids an explicit transpose copy) and an einsum + block
    reshape (``VIRNET_TPU_CONVT_IMPL=einsum``; single MXU matmul with a
    trivially convertible weight layout).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from ..precision import get_precision


def nearest_upsample(x: jnp.ndarray, sf: int) -> jnp.ndarray:
    """NHWC nearest-neighbor upsample by an integer factor."""
    x = jnp.repeat(x, sf, axis=-3)
    x = jnp.repeat(x, sf, axis=-2)
    return x


def nearest_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC nearest-neighbor resize to an arbitrary static size with torch
    index semantics: src = floor(dst * in / out).

    Exact integer downscale factors (the only case on the U-Net's padded
    power-of-two sizes) lower to strided slices — gathers (and their
    scatter-add VJPs) are slow on TPU, and this op sits in the conditioned
    down path of every AttResUNet forward."""
    h, w = x.shape[-3], x.shape[-2]
    if h % out_h == 0 and w % out_w == 0:
        sh, sw = h // out_h, w // out_w
        return x[..., ::sh, ::sw, :]
    rows = (jnp.arange(out_h) * h) // out_h
    cols = (jnp.arange(out_w) * w) // out_w
    return x[..., rows, :, :][..., :, cols, :]


def conv_transpose_2x2(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Transposed conv, kernel 2, stride 2, no padding.

    Args:
        x: (N, H, W, C).
        kernel: (2, 2, C, O) — [block_row, block_col, in, out].
        bias: (O,) or None.
    Returns:
        (N, 2H, 2W, O); out[n, 2i+a, 2j+b, o] = sum_c x[n,i,j,c] K[a,b,c,o].
    """
    if os.environ.get("VIRNET_TPU_CONVT_IMPL", "lax") != "einsum":
        return _conv_transpose_2x2_lax(x, kernel, bias)
    n, h, w, c = x.shape
    o = kernel.shape[-1]
    y = jnp.einsum("nhwc,abco->nhawbo", x, kernel,
                   precision=get_precision())
    y = y.reshape(n, 2 * h, 2 * w, o)
    if bias is not None:
        y = y + bias
    return y


def _conv_transpose_2x2_lax(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Same op through XLA's grad-conv emitter: ``lax.conv_transpose`` on
    the spatially-flipped kernel (bit-equivalence pinned by
    tests/test_degrade_ops.py::test_conv_transpose_lax_variant_matches_einsum).
    This is the DEFAULT path: the einsum form materializes an
    (h,w,a,b)->(h,a,w,b) transpose copy (~2.2 ms/apply in the round-3
    flagship profile) that this formulation avoids — the on-chip A/B
    (tools/bench_convt.py, 3 interleaved reps) measured 88.43 vs
    90.14 ms/apply on the flagship forward, stable to ±0.03 ms.  Set
    VIRNET_TPU_CONVT_IMPL=einsum to opt back into the einsum form."""
    y = lax.conv_transpose(x, kernel[::-1, ::-1], strides=(2, 2),
                           padding="VALID",
                           dimension_numbers=("NHWC", "HWIO", "NHWC"),
                           precision=get_precision())
    if bias is not None:
        y = y + bias
    return y
