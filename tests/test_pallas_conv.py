"""Pixel-pair Pallas conv kernels: interpret-mode parity vs XLA's conv.

These kernels replace XLA's pathological emitters for the DnCNN 64-channel
stack and the C_out in {1,3} tail convs (reference networks/DnCNN.py:37-44,
networks/AttResUNet.py:173); on-TPU speed is exercised by bench runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pallas_conv = pytest.importorskip(
    "virnet_tpu.ops.pallas_conv", reason="pallas unavailable")


def _xla_conv(x, w, b, slope=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + b
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    return y


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("slope", [None, 0.25])
def test_mid_pair_matches_xla(slope):
    rng = np.random.default_rng(0)
    n, h, w, c = 2, 9, 16, 4
    x = _rand(rng, (n, h, w, c))
    k = _rand(rng, (3, 3, c, c))
    b = _rand(rng, (c,))
    want = _xla_conv(x, k, b, slope)
    got = pallas_conv.unpair(pallas_conv.conv3x3_mid_pair(
        pallas_conv.pair(x), k, b, slope=slope, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_mid_pair_row_slabs():
    """Force multiple row slabs (incl. a ragged remainder)."""
    rng = np.random.default_rng(1)
    x = _rand(rng, (1, 11, 8, 4))
    k = _rand(rng, (3, 3, 4, 4))
    b = _rand(rng, (4,))
    want = _xla_conv(x, k, b)
    orig = pallas_conv._VMEM_BUDGET
    pallas_conv._VMEM_BUDGET = 1  # -> 8-row slabs
    try:
        got = pallas_conv.unpair(pallas_conv.conv3x3_mid_pair(
            pallas_conv.pair(x), k, b, interpret=True))
    finally:
        pallas_conv._VMEM_BUDGET = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("ci,co", [(3, 8), (4, 6), (1, 4)])
def test_in_pair_matches_xla(ci, co):
    rng = np.random.default_rng(2)
    n, h, w = 2, 7, 10
    x = _rand(rng, (n, h, w, ci))
    k = _rand(rng, (3, 3, ci, co))
    b = _rand(rng, (co,))
    want = _xla_conv(x, k, b, 0.25)
    got = pallas_conv.unpair(pallas_conv.conv3x3_in_pair(
        x, k, b, slope=0.25, interpret=True))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("co", [1, 3])
def test_out_pair_matches_xla(co):
    rng = np.random.default_rng(3)
    n, h, w, c = 2, 8, 12, 4
    x = _rand(rng, (n, h, w, c))
    k = _rand(rng, (3, 3, c, co))
    b = _rand(rng, (co,))
    want = _xla_conv(x, k, b)
    got = pallas_conv.conv3x3_out_pair(
        pallas_conv.pair(x), k, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_chained_stack_matches_xla():
    """conv_in -> 2x conv_mid -> conv_out chained entirely in pair layout
    (the fused DnCNN path) vs the same stack through XLA convs."""
    rng = np.random.default_rng(4)
    n, h, w, c, co = 1, 10, 12, 8, 1
    x = _rand(rng, (n, h, w, 3))
    k1 = _rand(rng, (3, 3, 3, c)) * 0.3
    km = [_rand(rng, (3, 3, c, c)) * 0.3 for _ in range(2)]
    kl = _rand(rng, (3, 3, c, co)) * 0.3
    b1, bl = _rand(rng, (c,)) * 0.1, _rand(rng, (co,)) * 0.1
    bm = [_rand(rng, (c,)) * 0.1 for _ in range(2)]

    want = _xla_conv(x, k1, b1, 0.25)
    for k, b in zip(km, bm):
        want = _xla_conv(want, k, b, 0.25)
    want = _xla_conv(want, kl, bl)

    y = pallas_conv.conv3x3_in_pair(x, k1, b1, slope=0.25, interpret=True)
    for k, b in zip(km, bm):
        y = pallas_conv.conv3x3_mid_pair(y, k, b, slope=0.25, interpret=True)
    got = pallas_conv.conv3x3_out_pair(y, kl, bl, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_mid_stack_fused_matches_sequential():
    """Fused L-conv kernel (multi-tile, halo blocks) vs per-conv calls and
    vs XLA, including the odd-width pad-column re-zeroing."""
    rng = np.random.default_rng(5)
    n, h, w, c, L = 2, 16, 8, 4, 3
    x = _rand(rng, (n, h, w, c)) * 0.5
    ks = [_rand(rng, (3, 3, c, c)) * 0.3 for _ in range(L)]
    bs = [_rand(rng, (c,)) * 0.1 for _ in range(L)]

    want = x
    for k, b in zip(ks, bs):
        want = _xla_conv(want, k, b, 0.25)

    orig = pallas_conv._VMEM_BUDGET
    pallas_conv._VMEM_BUDGET = 220 * 1024  # force r=8, nt=2 at p=4,c2=8
    try:
        got = pallas_conv.unpair(pallas_conv.conv3x3_mid_stack_pair(
            pallas_conv.pair(x), ks, bs, slope=0.25, interpret=True))
    finally:
        pallas_conv._VMEM_BUDGET = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_mid_stack_mask_last_px():
    """mask_last_px re-zeroes the odd-width pad column at every level —
    equivalent to running the unpadded stack (zero 'same' borders)."""
    rng = np.random.default_rng(6)
    n, h, w, c, L = 1, 8, 7, 4, 2
    x = _rand(rng, (n, h, w, c)) * 0.5
    ks = [_rand(rng, (3, 3, c, c)) * 0.3 for _ in range(L)]
    bs = [_rand(rng, (c,)) * 0.1 for _ in range(L)]
    want = x
    for k, b in zip(ks, bs):
        want = _xla_conv(want, k, b, 0.25)
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    got = pallas_conv.unpair(pallas_conv.conv3x3_mid_stack_pair(
        pallas_conv.pair(xp), ks, bs, slope=0.25, mask_last_px=True,
        interpret=True))[:, :, :w, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
