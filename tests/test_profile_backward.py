"""tools/profile_backward.py — HLO conv parsing + fwd/bwd classification.

The VERDICT-r4-item-6 closure rests on this parser attributing FLOPs to
the right fusions and splitting forward from VJP convolutions.  Two
pins: (a) a real compiled grad — every convolution in the optimized
HLO is found, attributed to a trace-visible instruction, and carries a
sane FLOPs estimate; (b) a TPU-style HLO fixture — classification via
op_name `transpose(jvp(...))` scopes and, when metadata is absent, the
structural signals (dW's batch-contracting dim_labels, dX's
rhs_reversal).  CPU XLA canonicalizes grad convs into plain b01f convs
with no metadata, so (b) cannot be exercised through a CPU compile —
the fixture uses the exact line shapes TPU HLO emits.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from profile_backward import classify, parse_hlo_convs  # noqa: E402


class TwoConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(16, (3, 3))(x)
        x = nn.relu(x)
        return nn.Conv(3, (3, 3))(x)


def test_parse_real_grad_hlo():
    m = TwoConv()
    x = jnp.zeros((2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return ((m.apply(p, x) - x) ** 2).mean()

    hlo = jax.jit(jax.grad(loss)).lower(params, x).compile().as_text()
    convs_by_instr = parse_hlo_convs(hlo)
    all_convs = [c for v in convs_by_instr.values() for c in v]
    # every convolution in the optimized HLO is attributed
    assert len(all_convs) == hlo.count(" convolution(")
    assert len(all_convs) >= 4  # 2 fwd + >=2 bwd forms survive opt
    assert all(c["flops"] > 0 for c in all_convs)
    # FLOPs magnitude sanity: fwd conv1 is ~2*N*H*W*9*Cin*Cout = 1.8e6;
    # allow layout-padding slack but catch unit errors
    assert any(5e5 < c["flops"] < 2e7 for c in all_convs)


FIXTURE = """\
HloModule jit_train_step

%fused_computation.1 (p0: bf16[16,192,192,96], p1: bf16[3,3,96,96]) -> bf16[16,192,192,96] {
  %p0 = bf16[16,192,192,96]{3,2,1,0} parameter(0)
  %p1 = bf16[3,3,96,96]{3,2,1,0} parameter(1)
  ROOT %conv.f = bf16[16,192,192,96]{3,2,1,0} convolution(%p0, %p1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f, metadata={op_name="jit(train_step)/jvp(VIRNet)/RNet/down_0_block_0/conv1/conv_general_dilated"}
}

%fused_computation.2 (p0: bf16[16,192,192,96], p1: bf16[3,3,96,96]) -> bf16[16,192,192,96] {
  %p0 = bf16[16,192,192,96]{3,2,1,0} parameter(0)
  %p1 = bf16[3,3,96,96]{3,2,1,0} parameter(1)
  ROOT %conv.dx = bf16[16,192,192,96]{3,2,1,0} convolution(%p0, %p1), window={size=3x3 pad=1_1x1_1 rhs_reversal=1x1}, dim_labels=b01f_01oi->b01f, metadata={op_name="jit(train_step)/transpose(jvp(VIRNet))/RNet/down_0_block_0/conv1/conv_general_dilated"}
}

%fused_computation.3 (p0: bf16[16,192,192,96], p1: bf16[16,192,192,96]) -> f32[3,3,96,96] {
  %p0 = bf16[16,192,192,96]{3,2,1,0} parameter(0)
  %p1 = bf16[16,192,192,96]{3,2,1,0} parameter(1)
  ROOT %conv.dw = f32[3,3,96,96]{3,2,1,0} convolution(%p0, %p1), window={size=192x192 pad=1_1x1_1}, dim_labels=f01b_i01o->01bf
}

ENTRY %main (a: bf16[16,192,192,96]) -> f32[3,3,96,96] {
  %a = bf16[16,192,192,96]{3,2,1,0} parameter(0)
  %fusion.1 = bf16[16,192,192,96]{3,2,1,0} fusion(%a), kind=kOutput, calls=%fused_computation.1
  %fusion.2 = bf16[16,192,192,96]{3,2,1,0} fusion(%fusion.1), kind=kOutput, calls=%fused_computation.2
  ROOT %fusion.3 = f32[3,3,96,96]{3,2,1,0} fusion(%fusion.1, %fusion.2), kind=kOutput, calls=%fused_computation.3
}
"""


def test_classify_tpu_style_fixture():
    convs = parse_hlo_convs(FIXTURE)
    assert set(convs) == {"fusion.1", "fusion.2", "fusion.3"}
    (fwd,), (dx,), (dw,) = (convs["fusion.1"], convs["fusion.2"],
                            convs["fusion.3"])
    assert classify(fwd) == "fwd"
    assert classify(dx) == "bwd"      # via transpose(jvp()) metadata
    assert classify(dw) == "bwd"      # no metadata: f01b dim_labels
    # fwd FLOPs: 2 * out(16*192*192*96) * win 9 * K(=96 feature dim)
    assert fwd["flops"] == 2 * 16 * 192 * 192 * 96 * 9 * 96
    # dW contraction: operand0's 'f' position is dim 0 -> 16 (batch)
    assert dw["flops"] == 2 * (3 * 3 * 96 * 96) * (192 * 192) * 16


def test_classify_metadata_only_strings():
    assert classify("jit(f)/jvp(M)/Conv_0/conv") == "fwd"
    assert classify("jit(f)/transpose(jvp(M))/Conv_0/conv") == "bwd"
