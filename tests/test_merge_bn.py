"""convert/merge_bn.py vs live torch Conv+BN forwards.

The reference's merge_bn (networks/SubBlocks.py:12-42) folds BN modules
into the preceding conv on a live module tree; ours is a state-dict
transform.  Equivalence oracle: run the ORIGINAL torch net in eval mode,
then rebuild the BN-free net from the folded state dict and compare
forwards.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from virnet_tpu.convert.merge_bn import (  # noqa: E402
    find_conv_bn_pairs, fold_bn, merge_bn_state_dict)


def _randomize_bn(bn, gen):
    with torch.no_grad():
        bn.running_mean.copy_(torch.randn(bn.num_features, generator=gen))
        bn.running_var.copy_(
            torch.rand(bn.num_features, generator=gen) * 2 + 0.1)
        if bn.affine:
            bn.weight.copy_(torch.randn(bn.num_features, generator=gen))
            bn.bias.copy_(torch.randn(bn.num_features, generator=gen))


def test_fold_conv_bn_sequential_matches_torch():
    gen = torch.Generator().manual_seed(0)
    net = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1),
        nn.BatchNorm2d(8),
        nn.ReLU(),
        nn.Conv2d(8, 8, 3, padding=1, bias=False),
        nn.BatchNorm2d(8),
    ).eval()
    for m in net:
        if isinstance(m, nn.BatchNorm2d):
            _randomize_bn(m, gen)
    x = torch.randn(2, 3, 16, 16, generator=gen)
    with torch.no_grad():
        want = net(x)

    sd = net.state_dict()
    assert find_conv_bn_pairs(sd) == [("0", "1"), ("3", "4")]
    folded = merge_bn_state_dict(sd)
    assert not any("running_mean" in k for k in folded)

    merged = nn.Sequential(
        nn.Conv2d(3, 8, 3, padding=1),
        nn.Identity(),
        nn.ReLU(),
        nn.Conv2d(8, 8, 3, padding=1, bias=True),  # fold creates a bias
        nn.Identity(),
    ).eval()
    merged[0].weight.data = torch.from_numpy(folded["0.weight"])
    merged[0].bias.data = torch.from_numpy(folded["0.bias"])
    merged[3].weight.data = torch.from_numpy(folded["3.weight"])
    merged[3].bias.data = torch.from_numpy(folded["3.bias"])
    with torch.no_grad():
        got = merged(x)
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_fold_transposed_conv_bn():
    gen = torch.Generator().manual_seed(1)
    conv = nn.ConvTranspose2d(5, 7, 2, stride=2)
    bn = nn.BatchNorm2d(7).eval()
    _randomize_bn(bn, gen)
    x = torch.randn(2, 5, 8, 8, generator=gen)
    with torch.no_grad():
        want = bn(conv(x))

    w_f, b_f = fold_bn(conv.weight.detach().numpy(),
                       conv.bias.detach().numpy(),
                       bn.running_mean.numpy(), bn.running_var.numpy(),
                       bn.weight.detach().numpy(), bn.bias.detach().numpy(),
                       eps=bn.eps, transposed=True)
    conv.weight.data = torch.from_numpy(w_f)
    conv.bias.data = torch.from_numpy(b_f)
    with torch.no_grad():
        got = conv(x)
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_fold_non_affine_and_linear():
    gen = torch.Generator().manual_seed(2)
    net = nn.Sequential(nn.Linear(6, 4),
                        nn.BatchNorm1d(4, affine=False)).eval()
    _randomize_bn(net[1], gen)
    x = torch.randn(3, 6, generator=gen)
    with torch.no_grad():
        want = net(x)

    folded = merge_bn_state_dict(net.state_dict())
    lin = nn.Linear(6, 4)
    lin.weight.data = torch.from_numpy(folded["0.weight"])
    lin.bias.data = torch.from_numpy(folded["0.bias"])
    with torch.no_grad():
        got = lin(x)
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_auto_detect_skips_transposed_channel_mismatch():
    """IOHW detection: BN channels match dim 1 only -> transposed fold."""
    gen = torch.Generator().manual_seed(3)
    net = nn.Sequential(nn.ConvTranspose2d(5, 7, 2, stride=2),
                        nn.BatchNorm2d(7)).eval()
    _randomize_bn(net[1], gen)
    x = torch.randn(2, 5, 8, 8, generator=gen)
    with torch.no_grad():
        want = net(x)

    folded = merge_bn_state_dict(net.state_dict())
    conv = nn.ConvTranspose2d(5, 7, 2, stride=2)
    conv.weight.data = torch.from_numpy(folded["0.weight"])
    conv.bias.data = torch.from_numpy(folded["0.bias"])
    with torch.no_grad():
        got = conv(x)
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=1e-5, atol=1e-5)
