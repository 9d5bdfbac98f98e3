"""Top-level VIRNet models (reference: networks/VIRNet.py).

``VIRNet``   — blind denoising: SNet predicts a per-pixel noise variance map
               σ², RNet restores conditioned on sqrt(σ²).
``VIRNetSR`` — blind SISR: adds KNet predicting the blur-kernel covariance
               info (λ1, λ2, ρ); the LR input is nearest-upsampled x sf and
               RNet is conditioned on broadcast kernel/noise maps.

Both return the variational posterior parameters used by the ELBO losses.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.upsample import nearest_upsample
from .attresunet import AttResUNet
from .dncnn import DnCNN
from .knet import KernelNet

LOG_MAX = math.log(1e2)
LOG_MIN = math.log(1e-10)


class VIRNet(nn.Module):
    """Denoising VIRNet (reference VIRAttResUNet, networks/VIRNet.py:18-46)."""
    im_chn: int = 3
    sigma_chn: int = 3
    n_feat: Sequence[int] = (64, 128, 192)
    dep_S: int = 5
    n_resblocks: int = 2
    noise_cond: bool = True
    extra_mode: str = "input"
    noise_avg: bool = False
    remat: bool = False
    pad_narrow: int = 0   # MXU-friendly width for narrow output convs
                          # (bit-exact; see models/common.PadOutConv)
    conv_impl: str = "xla"   # 'xla' | 'pair' | 'pair_interpret': Pallas
                             # pixel-pair kernels for the SNet stack and
                             # the RNet tail (forward-only fast path)
    tail_impl: str = ""      # override the RNet tail alone: '' follows
                             # conv_impl; 'fused' = Pallas conv+residual
                             # in one program (eval fast path)

    def setup(self):
        self.SNet = DnCNN(out_channels=self.sigma_chn, dep=self.dep_S,
                          noise_avg=self.noise_avg,
                          pad_narrow=self.pad_narrow,
                          conv_impl=self.conv_impl, name="snet")
        self.RNet = AttResUNet(out_chn=self.im_chn, n_feat=self.n_feat,
                               n_resblocks=self.n_resblocks,
                               extra_mode=self.extra_mode if self.noise_cond
                               else "null",
                               remat=self.remat,
                               pad_narrow=self.pad_narrow,
                               tail_impl=self.tail_impl or self.conv_impl,
                               name="rnet")

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (N, H, W, C) noisy -> (mu (N,H,W,C), sigma (N,H,W,sigma_chn))."""
        sigma = jnp.exp(jnp.clip(self.SNet(x), LOG_MIN, LOG_MAX))
        extra = jnp.sqrt(sigma) if self.noise_cond else None
        mu = self.RNet(x, extra)
        return mu, sigma

    def restore_from_head(self, x: jnp.ndarray,
                          head_pre: jnp.ndarray) -> jnp.ndarray:
        """RNet continuation for the boundary-free fused prologue
        (models/fused.py): SNet + sigma + the head conv already ran in
        one Pallas program; this applies the rest of RNet."""
        return self.RNet(x, None, head_pre=head_pre)


class VIRNetSR(nn.Module):
    """SISR VIRNet (reference VIRAttResUNetSR, networks/VIRNet.py:48-97)."""
    im_chn: int = 3
    sigma_chn: int = 1
    kernel_chn: int = 3
    n_feat: Sequence[int] = (64, 128, 192)
    dep_S: int = 5
    dep_K: int = 8
    noise_cond: bool = True
    kernel_cond: bool = True
    n_resblocks: int = 1
    extra_mode: str = "down"
    noise_avg: bool = True
    remat: bool = False
    pad_narrow: int = 0   # MXU-friendly width for narrow output convs
                          # (bit-exact; see models/common.PadOutConv)
    conv_impl: str = "xla"   # see VIRNet.conv_impl
    tail_impl: str = ""      # see VIRNet.tail_impl

    def setup(self):
        self.SNet = DnCNN(out_channels=self.sigma_chn, dep=self.dep_S,
                          noise_avg=self.noise_avg,
                          pad_narrow=self.pad_narrow,
                          conv_impl=self.conv_impl, name="snet")
        self.KNet = KernelNet(out_chn=self.kernel_chn, num_blocks=self.dep_K,
                              name="knet")
        cond = self.noise_cond or self.kernel_cond
        self.RNet = AttResUNet(out_chn=self.im_chn, n_feat=self.n_feat,
                               n_resblocks=self.n_resblocks,
                               extra_mode=self.extra_mode if cond else "null",
                               remat=self.remat,
                               pad_narrow=self.pad_narrow,
                               tail_impl=self.tail_impl or self.conv_impl,
                               name="rnet")

    def __call__(self, x: jnp.ndarray, sf: int):
        """x: (N, h, w, C) LR input; sf: static integer scale factor.

        Returns (mu (N, h*sf, w*sf, C), kinfo (N, 3), sigma).
        ``sigma`` is (N, 1, 1, sigma_chn) when noise_avg else a map.
        """
        sigma = jnp.exp(jnp.clip(self.SNet(x), LOG_MIN, LOG_MAX))
        kinfo = self.KNet(x)                                    # N x 3
        x_up = nearest_upsample(x, sf)
        h_up, w_up = x_up.shape[-3], x_up.shape[-2]

        # When every conditioning map is constant per sample (kinfo always
        # is; sigma is when noise_avg), pass the compact (N, 1, 1, C) form —
        # AttResUNet broadcasts it for the head concat and feeds the SFT
        # gates at 1x1 (bit-identical, H*W-times less gate compute).
        compact = not self.noise_cond or self.noise_avg
        extras = []
        if self.kernel_cond:
            kmap = kinfo[:, None, None, :]
            if not compact:
                kmap = jnp.broadcast_to(kmap, (x.shape[0], h_up, w_up, 3))
            extras.append(kmap.astype(x.dtype))
        if self.noise_cond:
            s = jnp.sqrt(sigma)
            if self.noise_avg:
                smap = s            # (N, 1, 1, sigma_chn)
            else:
                smap = nearest_upsample(s, sf)
            extras.append(smap)
        extra = jnp.concatenate(extras, axis=-1) if extras else None

        mu = self.RNet(x_up, extra)
        return mu, kinfo, sigma


# Released-checkpoint architecture presets
# (reference scripts/testing_demo.py:21-75)
ARCH_PRESETS = {
    "denoising-syn": dict(
        cls="VIRNet", im_chn=3, sigma_chn=1, n_feat=(96, 192, 288), dep_S=5,
        n_resblocks=3, extra_mode="input", noise_cond=True, noise_avg=False),
    "denoising-real": dict(
        cls="VIRNet", im_chn=3, sigma_chn=3, n_feat=(96, 160, 224, 288),
        dep_S=8, n_resblocks=3, extra_mode="input", noise_cond=True,
        noise_avg=False),
    "sisr": dict(
        cls="VIRNetSR", im_chn=3, sigma_chn=1, kernel_chn=3,
        n_feat=(96, 160, 224), dep_S=5, dep_K=8, n_resblocks=2,
        extra_mode="both", noise_cond=True, kernel_cond=True, noise_avg=True),
}


def build_model(task: str, **overrides):
    """Construct a model from a released-checkpoint preset name.

    ``conv_impl`` defaults to 'auto' = 'xla' (measured fastest in-model;
    see models/common.resolve_conv_impl).  VIRNET_TPU_PALLAS_CONV=1
    opts the SNet stack + RNet tail into the Pallas pixel-pair kernels
    on TPU backends."""
    from .common import resolve_conv_impl
    cfg = dict(ARCH_PRESETS[task])
    cls_name = cfg.pop("cls")
    cfg.update(overrides)
    cfg["conv_impl"] = resolve_conv_impl(cfg.get("conv_impl", "auto"))
    cls = VIRNet if cls_name == "VIRNet" else VIRNetSR
    return cls(**cfg)
