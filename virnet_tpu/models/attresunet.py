"""RNet — attention-conditioned residual U-Net (reference:
networks/AttResUNet.py).

Structure per reference semantics:
  * input reflect-padded to a multiple of 2^(depth-1), cropped at the end,
    with a global residual connection;
  * extra (degradation) maps can condition the head input ('input'/'both')
    and/or every scale of the down path ('down'/'both') via SFT-style
    AttLayers producing a sigmoid gate and an additive shift;
  * down path: n_resblocks AttResBlocks then a stride-2 conv; bottom block
    has no downsample; up path: 2x2-stride-2 transposed conv, additive skip,
    then unconditioned AttResBlocks.

TPU-first choices: NHWC layout; the transposed conv is an einsum+reshape
(ops/upsample.py) that lowers to one MXU matmul; the whole net is static
shape under jit for each padded input bucket.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.pad import pad_to_multiple
from ..ops.upsample import conv_transpose_2x2, nearest_resize
from ..precision import get_compute_dtype, get_precision
from .common import (ConvParams, PadOutConv, conv, lrelu,
                     make_torch_bias_init, torch_kernel_init)


class AttLayer(nn.Module):
    out_chn: int

    @nn.compact
    def __call__(self, extra: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        nf1 = self.out_chn // 8
        nf2 = self.out_chn // 4
        f = conv(nf1, 1, extra.shape[-1], name="conv1")(extra)
        f = lrelu(f, 0.2)
        f = conv(nf2, 1, nf1, name="conv2")(f)
        f = lrelu(f, 0.2)
        mul = jax.nn.sigmoid(conv(self.out_chn, 1, nf2, name="mul_conv")(f))
        add = conv(self.out_chn, 1, nf2, name="add_conv")(f)
        return mul, add


class AttResBlock(nn.Module):
    nf: int
    conditioned: bool
    remat_gates: bool = False   # recompute SFT gates in backward: the gate
                                # tensors are 4 full-width feature maps per
                                # block and dominate the conditioned down
                                # path's HBM traffic

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 extra: Optional[jnp.ndarray]) -> jnp.ndarray:
        Gate = nn.remat(AttLayer) if self.remat_gates else AttLayer
        if self.conditioned:
            mul1, add1 = Gate(self.nf, name="sft1")(extra)
        else:
            mul1, add1 = 1.0, 0.0
        f = conv(self.nf, 3, self.nf, name="conv1")(lrelu(x * mul1 + add1, 0.2))
        if self.conditioned:
            mul2, add2 = Gate(self.nf, name="sft2")(extra)
        else:
            mul2, add2 = 1.0, 0.0
        f = conv(self.nf, 3, self.nf, name="conv2")(lrelu(f * mul2 + add2, 0.2))
        return x + f


class UpBlock(nn.Module):
    out_chn: int
    n_resblocks: int
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, bridge: jnp.ndarray) -> jnp.ndarray:
        in_chn = x.shape[-1]
        kernel = self.param("up_kernel", torch_kernel_init,
                            (2, 2, in_chn, self.out_chn))
        bias = self.param("up_bias", make_torch_bias_init(4 * in_chn),
                          (self.out_chn,))
        cdt = get_compute_dtype()
        if cdt is not None:
            kernel = kernel.astype(cdt)
            bias = bias.astype(cdt)
        x_up = conv_transpose_2x2(x, kernel, bias)
        Block = nn.remat(AttResBlock) if self.remat else AttResBlock
        for ii in range(self.n_resblocks):
            inp = x_up + bridge if ii == 0 else x_up
            x_up = Block(self.out_chn, conditioned=False,
                         name=f"block_{ii}")(inp, None)
        return x_up


class AttResUNet(nn.Module):
    out_chn: int = 3
    n_feat: Sequence[int] = (64, 128, 196, 256)
    n_resblocks: int = 2
    extra_mode: str = "input"   # null | input | down | both
    remat: bool = False         # rematerialize blocks (saves HBM traffic for
                                # the SFT gate tensors in the backward pass)
    pad_narrow: int = 0         # compute the 3-channel tail conv at this
                                # output width (bit-exact slice; see
                                # common.PadOutConv); 0 disables
    tail_impl: str = "xla"      # 'xla' | 'pair' | 'pair_interpret': 'pair'
                                # runs the 3-channel tail conv through the
                                # Pallas narrow-output kernel (XLA's
                                # batch-in-lanes emitter is ~100x off
                                # ideal at C_out=3; forward-only)

    @nn.compact
    def __call__(self, x_in: jnp.ndarray,
                 extra_in: Optional[jnp.ndarray],
                 head_pre: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        mode = self.extra_mode.lower()
        assert mode in ("null", "input", "down", "both")
        Block = nn.remat(AttResBlock) if self.remat else AttResBlock
        depth = len(self.n_feat)
        h, w = x_in.shape[-3], x_in.shape[-2]
        mod = 2 ** (depth - 1)

        # A spatially 1x1 extra means per-sample-constant conditioning (the
        # SISR arch: broadcast kernel info + per-image sigma).  The SFT
        # AttLayers are 1x1 convs, so gates computed on the compact (N,1,1,C)
        # map and broadcast are bit-identical to gates computed on the
        # broadcast map — and skip H*W-times redundant compute in both
        # passes (the gate-conv backwards alone were ~10% of the SISR train
        # step).  Only the head concat needs the full-resolution map (its
        # 3x3 conv sees zero-pad borders).
        compact = (extra_in is not None
                   and extra_in.shape[-3] == 1 and extra_in.shape[-2] == 1)

        if head_pre is not None:
            # precomputed head activation (the boundary-free fused
            # SNet+sigma+head program, ops/pallas_conv.dncnn_head_fused;
            # see models/fused.py).  Only legal where pad_to_multiple is
            # a no-op and the down path is unconditioned — the fused op
            # consumed extra already.  The head conv's params are NOT
            # declared on this path: apply() with a pre-trained tree is
            # the only supported entry (eval fast path).
            assert h % mod == 0 and w % mod == 0, \
                "head_pre path requires pad-free input sizes"
            assert mode in ("null", "input"), \
                "head_pre path cannot condition the down path"
            x, extra = head_pre, None
        else:
            x = pad_to_multiple(x_in, mod)
            if mode == "null":
                extra = None
            elif compact:
                extra = jnp.broadcast_to(
                    extra_in, x.shape[:-1] + (extra_in.shape[-1],))
            else:
                extra = pad_to_multiple(extra_in, mod)

            if mode in ("input", "both"):
                head_in = jnp.concatenate([x, extra], axis=-1)
            else:
                head_in = x
            x = conv(self.n_feat[0], 3, head_in.shape[-1],
                     name="head")(head_in)

        cond_down = mode in ("down", "both")
        bridges = []
        extra_cur = extra_in if compact else extra
        for ii in range(depth):
            nf = self.n_feat[ii]
            for jj in range(self.n_resblocks):
                x = Block(nf, conditioned=cond_down,
                          name=f"down_{ii}_block_{jj}")(
                              x, extra_cur if cond_down else None)
            if ii + 1 < depth:
                bridges.append(x)
                x = conv(self.n_feat[ii + 1], 3, nf, stride=2,
                         name=f"down_{ii}_sampler")(x)
                if cond_down and not compact:
                    extra_cur = nearest_resize(extra, x.shape[-3],
                                               x.shape[-2])

        for jj in reversed(range(depth - 1)):
            x = UpBlock(self.n_feat[jj], self.n_resblocks, remat=self.remat,
                        name=f"up_{jj}")(x, bridges[jj])

        if (self.tail_impl.startswith("fused")
                and x.shape[-3] == h and x.shape[-2] == w and w % 2 == 0
                and x_in.shape[-1] == self.out_chn):
            # fused Pallas tail: conv + bias + the global residual in one
            # VMEM-resident program (ops/pallas_conv.conv3x3_tail_residual;
            # XLA's C_out=3 emitter runs at ~1% of ideal).  Only when
            # pad_to_multiple was a no-op — the pad slice would otherwise
            # sit between conv and residual.  Forward-only (eval path).
            from ..ops import pallas_conv as pc
            kt, bt = ConvParams(self.out_chn, 3, self.n_feat[0],
                                name="tail")()
            out2 = pc.conv3x3_tail_residual(
                pc.pair(x), pc.pair(x_in), kt, bt,
                interpret=self.tail_impl == "fused_interpret")
            return pc.unpair(out2)
        if self.tail_impl.startswith("fused"):
            # non-qualifying shape (internal pad active / odd W): the
            # reference-exact XLA conv + slice + residual (round-3
            # measured the pure-XLA narrow-out form WORSE in-model)
            kt, bt = ConvParams(self.out_chn, 3, self.n_feat[0],
                                name="tail")()
            out = jax.lax.conv_general_dilated(
                x, kt, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=get_precision(),
                preferred_element_type=jnp.float32)
            out = (out + bt.astype(jnp.float32)).astype(x.dtype)
        elif self.tail_impl.startswith("pair"):
            from ..ops import pallas_conv as pc
            kt, bt = ConvParams(self.out_chn, 3, self.n_feat[0],
                                name="tail")()
            out = pc.conv3x3_out_pair(
                pc.pair(x), kt, bt,
                interpret=self.tail_impl == "pair_interpret")
        elif self.pad_narrow > self.out_chn:
            out = PadOutConv(self.out_chn, 3, self.n_feat[0],
                             pad_to=self.pad_narrow, name="tail")(x)
        else:
            out = conv(self.out_chn, 3, self.n_feat[0], name="tail")(x)
        return out[..., :h, :w, :] + x_in
