"""Boundary-free fused denoise forward (eval fast path).

Round-3's SNet-only fused kernel beat XLA 2x standalone but lost
in-model to +2-7 ms of layout materialization at the custom-call
boundary (BASELINE.md "pixel-pair conv postmortem").  This module tests
that postmortem's own hypothesis: amortize ONE boundary over more work
by fusing the whole denoise prologue — DnCNN stack, the variational
sigma = exp(clip(.)) / extra = sqrt(sigma) epilogue (reference
networks/VIRNet.py:43-45), and RNet's 3x3 head conv on [x | extra]
(networks/AttResUNet.py head, whose XLA im2col concatenate measured
2.7 ms in-model) — into one Pallas program
(ops/pallas_conv.dncnn_head_fused), then continue RNet from the head
activation.

Scope: the denoise VIRNet with extra_mode='input' (both released
denoising archs), at input sizes where RNet's reflect pad_to_multiple
is a no-op (H, W % 2^(depth-1) == 0 — the flagship bench shape and the
SIDD/DND block paths).  Forward-only; selected per traced shape inside
the engine's jitted forward, so non-qualifying shapes silently take the
reference-exact unfused path.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import pallas_conv as pc
from ..precision import get_compute_dtype
from .virnet import LOG_MAX, LOG_MIN, VIRNet


def fused_head_supported(model, shape) -> bool:
    """True when (model, input shape) qualifies for the fused prologue."""
    if not isinstance(model, VIRNet):
        return False
    if not model.noise_cond or model.extra_mode.lower() != "input":
        return False
    if getattr(model, "noise_avg", False):
        return False
    h, w = shape[-3], shape[-2]
    mod = 2 ** (len(model.n_feat) - 1)
    return h % mod == 0 and w % mod == 0 and w % 2 == 0 and pc.HAS_PALLAS


def denoise_forward_fused(model: VIRNet, params, x: jnp.ndarray,
                          interpret: bool = False, mode: str = "halo",
                          rows=None):
    """(mu, sigma) via the fused prologue + RNet continuation.

    Numerics match the unfused forward: the Pallas convs accumulate in
    f32 with one rounding per conv (like XLA at Precision.HIGHEST), and
    the epilogue applies the same op order (round conv_last output to
    the activation dtype, then clip/exp/sqrt in that dtype)."""
    sp = params["snet"]
    dep = model.dep_S
    k1, b1 = sp["conv1"]["kernel"], sp["conv1"]["bias"]
    kms = [sp[f"mid_{i}"]["kernel"] for i in range(1, dep - 1)]
    bms = [sp[f"mid_{i}"]["bias"] for i in range(1, dep - 1)]
    kl, bl = sp["conv_last"]["kernel"], sp["conv_last"]["bias"]
    kh = params["rnet"]["head"]["kernel"]
    bh = params["rnet"]["head"]["bias"]

    cdt = get_compute_dtype()
    xk = x.astype(cdt) if cdt is not None else x
    # slope 0.25 = DnCNN.slope default (VIRNet.setup builds SNet with it)
    head, sigma = pc.dncnn_head_fused(
        xk, k1, b1, kms, bms, kl, bl, kh, bh, slope=0.25,
        lmin=LOG_MIN, lmax=LOG_MAX, interpret=interpret, mode=mode,
        rows=rows)
    mu = model.apply({"params": params}, x, head,
                     method=VIRNet.restore_from_head)
    return mu, sigma
