"""SNet — a plain DnCNN-style conv stack that predicts the log noise
variance (reference: networks/DnCNN.py:8-52).

conv3x3 -> LeakyReLU(0.25) repeated ``dep`` times, 64 filters, orthogonal
init with leaky-relu gain and zero bias; optional global average pooling to
a per-image scalar (SISR's ``noise_avg``)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import (ConvParams, PadOutConv, conv, leaky_relu_gain, lrelu,
                     orthogonal_gain_init)


class DnCNN(nn.Module):
    out_channels: int
    dep: int = 5
    num_filters: int = 64
    noise_avg: bool = False
    slope: float = 0.25
    pad_narrow: int = 0   # compute the 1/3-channel conv_last at this output
                          # width (bit-exact slice; common.PadOutConv)
    conv_impl: str = "xla"   # 'xla' | 'pair' | 'pair_interpret' | 'scan':
                             # 'pair' runs the whole stack through the
                             # Pallas pixel-pair kernels (forward-only;
                             # the XLA path remains the training default);
                             # 'scan' rolls the identical mid convs into
                             # one lax.scan (single XLA tiling decision)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = orthogonal_gain_init(leaky_relu_gain(self.slope))
        zeros = nn.initializers.zeros_init()
        in_chn = x.shape[-1]

        if self.conv_impl.startswith("pair"):  # pair | pair_ops | pair_interpret
            x = self._pair_stack(x, in_chn, init, zeros)
        elif self.conv_impl == "scan":
            x = self._scan_stack(x, in_chn, init, zeros)
        else:
            x = conv(self.num_filters, 3, in_chn, name="conv1",
                     kernel_init=init, bias_init=zeros)(x)
            x = lrelu(x, self.slope)
            for ii in range(1, self.dep - 1):
                x = conv(self.num_filters, 3, self.num_filters,
                         name=f"mid_{ii}", kernel_init=init,
                         bias_init=zeros)(x)
                x = lrelu(x, self.slope)
            if self.pad_narrow > self.out_channels:
                x = PadOutConv(self.out_channels, 3, self.num_filters,
                               pad_to=self.pad_narrow, kernel_init=init,
                               bias_init=zeros, name="conv_last")(x)
            else:
                x = conv(self.out_channels, 3, self.num_filters,
                         name="conv_last", kernel_init=init,
                         bias_init=zeros)(x)
        if self.noise_avg:
            x = jnp.mean(x, axis=(-3, -2), keepdims=True)
        return x

    def _scan_stack(self, x, in_chn, init, zeros):
        """The identical mid convs as ONE lax.scan over stacked weights.

        Motivation (BASELINE.md ceiling table): XLA's cost-model search
        assigns *different* window tilings to the structurally identical
        64-channel mid convs (measured 2.06 vs 5.46 ms at 32x256^2) —
        scanning a single conv instruction forces one tiling decision for
        all of them.  Parameter tree (conv1/mid_i/conv_last) is identical
        to the XLA branch, so checkpoints are interchangeable; selected
        via conv_impl='scan' (VIRNET_TPU_SNET_SCAN=1)."""
        from jax import lax

        from ..precision import get_precision

        x = conv(self.num_filters, 3, in_chn, name="conv1",
                 kernel_init=init, bias_init=zeros)(x)
        x = lrelu(x, self.slope)
        kms, bms = [], []
        for ii in range(1, self.dep - 1):
            km, bm = ConvParams(self.num_filters, 3, self.num_filters,
                                kernel_init=init, bias_init=zeros,
                                name=f"mid_{ii}")()
            kms.append(km)
            bms.append(bm)
        if kms:
            # same dtype promotion as nn.Conv(dtype=None): inputs and
            # params promoted jointly
            dt = jnp.result_type(x, kms[0])
            x = x.astype(dt)
            ks = jnp.stack(kms).astype(dt)
            bs = jnp.stack(bms).astype(dt)

            def body(h, kb):
                k, b = kb
                h = lax.conv_general_dilated(
                    h, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=get_precision()) + b
                return lrelu(h, self.slope), None

            x, _ = lax.scan(body, x, (ks, bs))
        if self.pad_narrow > self.out_channels:
            return PadOutConv(self.out_channels, 3, self.num_filters,
                              pad_to=self.pad_narrow, kernel_init=init,
                              bias_init=zeros, name="conv_last")(x)
        return conv(self.out_channels, 3, self.num_filters,
                    name="conv_last", kernel_init=init, bias_init=zeros)(x)

    def _pair_stack(self, x, in_chn, init, zeros):
        """The whole conv1 -> mids -> conv_last stack through the fused
        Pallas kernel (ops/pallas_conv.dncnn_pair_fused: one program per
        row tile, 64-channel activations never leave VMEM); parameter tree
        identical to the XLA branch.  Odd widths are padded and re-masked
        every level in-kernel so zero 'same'-padding semantics stay
        bit-exact."""
        from ..ops import pallas_conv as pc

        interp = self.conv_impl == "pair_interpret"
        nf = self.num_filters
        k1, b1 = ConvParams(nf, 3, in_chn, kernel_init=init,
                            bias_init=zeros, name="conv1")()
        kms, bms = [], []
        for ii in range(1, self.dep - 1):
            km, bm = ConvParams(nf, 3, nf, kernel_init=init,
                                bias_init=zeros, name=f"mid_{ii}")()
            kms.append(km)
            bms.append(bm)
        kl, bl = ConvParams(self.out_channels, 3, nf, kernel_init=init,
                            bias_init=zeros, name="conv_last")()
        return pc.dncnn_pair_fused(
            x, k1, b1, kms, bms, kl, bl, slope=self.slope,
            force_ops=self.conv_impl == "pair_ops", interpret=interp)
