"""W8A8 integer convolution for the MXU — the int8 serving path.

Why: the flagship forward is bound by XLA's bf16 conv emitters at ~60-67%
of the v5e's 197 TFLOP/s bf16 peak (BASELINE.md ceiling table).  The MXU's
int8 path has 2x that peak (394 TOPS), so an int8 conv can beat the bf16
ceiling the channel widths impose — at a quantization cost to the restored
image that must be (and is) measured, never assumed.  This is capability
the reference does not have (torch eager fp32 on A100); it exists here as
an explicitly opt-in serving mode (``--compute int8``), never a default,
because its output is NOT checkpoint-faithful.

Scheme (all in-graph, no calibration state):
  * activations — dynamic symmetric per-INPUT-CHANNEL scales.  A per-i
    scale cannot be applied after the int32 accumulation (it sits inside
    the sum over i), so it is folded into the WEIGHT before the weight is
    quantized: w'[...,i,o] = w[...,i,o] * sx[i].  Folding costs one
    rescale of the (k,k,Ci,Co) kernel per call — trivial next to the conv.
  * weights — symmetric per-OUTPUT-CHANNEL absmax over (kh,kw,Ci) of the
    folded kernel; int32 accumulation; dequant y = acc * sw[o] (the sx
    factors are already inside sw via the fold); bias added in float.

Rounding is jnp.round (ties-to-even) with clip to [-127, 127]; scales are
guarded against zero (dead channels quantize to zeros, not NaNs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_QMAX = 127.0
_EPS = 1e-12

__all__ = ["quantize_symmetric", "conv_w8a8"]


def quantize_symmetric(x: jnp.ndarray, axes, keepdims: bool = True):
    """Symmetric absmax int8 quantization over ``axes``.

    Returns (q_int8, scale) with x ≈ q * scale."""
    s = jnp.max(jnp.abs(x), axis=axes, keepdims=keepdims)
    s = jnp.maximum(s.astype(jnp.float32), _EPS) / _QMAX
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -_QMAX, _QMAX)
    return q.astype(jnp.int8), s


def conv_w8a8(x: jnp.ndarray, kernel: jnp.ndarray,
              bias: jnp.ndarray | None = None, *,
              stride: int = 1, padding: int | None = None) -> jnp.ndarray:
    """int8 x int8 -> int32 convolution of float NHWC inputs.

    ``x`` (N,H,W,Ci) and ``kernel`` (kh,kw,Ci,Co) are float (fp32/bf16);
    both are quantized in-graph per the module docstring.  Output is
    float32 (callers cast to their compute dtype).  ``padding=None``
    means the package's torch-style integer pad kernel//2.
    """
    kh = kernel.shape[0]
    if padding is None:
        padding = kh // 2
    # dynamic per-input-channel activation scale, folded into the kernel
    xq, sx = quantize_symmetric(x, axes=(0, 1, 2))          # (1,1,1,Ci)
    k_folded = kernel.astype(jnp.float32) * sx.reshape(1, 1, -1, 1)
    kq, sw = quantize_symmetric(k_folded, axes=(0, 1, 2))   # (1,1,1,Co)
    acc = lax.conv_general_dilated(
        xq, kq, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sw.reshape(1, 1, 1, -1)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y
