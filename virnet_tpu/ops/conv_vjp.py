"""3x3 SAME conv with a forward-style dX emitter (custom VJP).

Round-5 chip profile (tools/profile_backward.py, BASELINE.md "round-5
backward closure"): in both train steps the dX convolutions run 10-13
points of MXU peak BELOW their forward counterparts (e.g. SISR x4:
16x96²x160 dX at 38% vs the same-shape forward at 49%; 16x192²x96 dX at
53% vs 66%), while the dW convolutions are the best emitters in the
step (70%).  XLA emits dX with the kernel in its transposed `01oi`
layout plus `rhs_reversal`, and the TPU emitter tiles that form worse
than the plain `01io` forward form.

This module expresses the SAME math with the reversal/transpose
materialized on the 3x3xCxC kernel (a trivially cheap host-of-MXU op)
so the dX convolution itself is byte-identical in form to a forward
conv — giving the emitter the tiling it already achieves on the
forward pass:

    dX = conv_same(dY, flip_hw(K).swap(I,O))        # plain b01f_01io
    dW[kh,kw,ci,co] = sum_nhw X[n,h+kh-1,w+kw-1,ci] * dY[n,h,w,co]
                                                    # XLA's own form

Opt-in via VIRNET_TPU_DX_IMPL=fwdstyle (models/common.conv routes every
stride-1 3x3 conv here); gradients are pinned equal to the default
path by tests/test_conv_vjp.py.  Reference hot loop this targets:
train_SISR.py:197-228 / train_denoising_syn.py:158 (the RNet backward,
59% of our measured step).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _conv_same(x, k, precision):
    """Plain stride-1 SAME conv, NHWC/HWIO — the forward emitter form."""
    pad = (k.shape[0] - 1) // 2
    return lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_same_fwddx(x, k, precision=None):
    """conv_same(x, k) whose dX is emitted as a forward-form conv."""
    return _conv_same(x, k, precision)


def _fwd(x, k, precision):
    return _conv_same(x, k, precision), (x, k)


def _bwd(precision, res, dy):
    x, k = res
    # dX: flip the kernel spatially and swap I<->O, then run the exact
    # forward-form conv.  The transpose is 3x3xCxC — negligible next to
    # the conv it unlocks.
    k_t = jnp.swapaxes(jnp.flip(k, axis=(0, 1)), 2, 3)
    dx = _conv_same(dy, k_t, precision)
    # dW: XLA's own formulation (measured at ~70% of peak — keep it):
    # treat x's batch as the contraction, dy as the kernel.
    #   lhs  = x  (N,H,W,Ci)  read as  (I=N, spatial H W, O-free) "CHWN"?
    # dim spec strings: lhs "fHWb" isn't expressible via the letter API,
    # so use explicit ConvDimensionNumbers: lhs x (N,H,W,C) with
    # batch<->feature swapped, rhs dy (N,H,W,C) as (I=N, spatial, O=C),
    # out (kh,kw,Ci,Co) laid out as (Ci, kh, kw, Co) then transposed.
    pad = (k.shape[0] - 1) // 2
    dn = lax.ConvDimensionNumbers(
        lhs_spec=(3, 0, 1, 2),   # (batch=Ci@dim3, feature=N@dim0, H, W)
        rhs_spec=(3, 0, 1, 2),   # (out=Co@dim3, in=N@dim0, H, W)
        out_spec=(2, 3, 0, 1),   # out dims: (kh, kw, Ci, Co) -> HWIO
    )
    dw = lax.conv_general_dilated(
        x, dy, window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=dn,
        precision=precision)
    return dx.astype(x.dtype), dw.astype(k.dtype)


conv3x3_same_fwddx.defvjp(_fwd, _bwd)
