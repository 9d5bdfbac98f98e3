"""Degradation-op parity against torch CPU ops (independent golden — raw
torch functional API, not reference code)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from virnet_tpu.ops import degrade as D
from virnet_tpu.ops import upsample as U


def _torch_blur_per_sample(x_nchw, kernels, correlate=True):
    n, c, h, w = x_nchw.shape
    k = kernels.shape[-1]
    kt = torch.from_numpy(kernels)
    if not correlate:
        kt = torch.flip(kt, dims=(-2, -1))
    xt = torch.from_numpy(x_nchw)
    xp = F.pad(xt, (k // 2,) * 4, mode="reflect")
    # grouped conv3d trick: batch as groups
    out = F.conv3d(xp.unsqueeze(0), kt.unsqueeze(1).unsqueeze(1), groups=n)
    return out[0].numpy()


def test_blur_per_sample_matches_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 16, 18, 3)).astype(np.float32)
    kernels = rng.random((2, 5, 5)).astype(np.float32)
    kernels /= kernels.sum(axis=(-2, -1), keepdims=True)

    got = np.asarray(D.blur_per_sample(
        jnp.asarray(x), jnp.asarray(kernels), correlate=True))
    want = _torch_blur_per_sample(x.transpose(0, 3, 1, 2), kernels,
                                  correlate=True).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_blur_convolve_flips_kernel():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 12, 12, 1)).astype(np.float32)
    ker = rng.random((1, 3, 3)).astype(np.float32)
    a = np.asarray(D.blur_per_sample(jnp.asarray(x), jnp.asarray(ker),
                                     correlate=False))
    b = np.asarray(D.blur_per_sample(
        jnp.asarray(x), jnp.asarray(ker[:, ::-1, ::-1].copy()),
        correlate=True))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_imconv_np_matches_scipy_symmetric_padding():
    import scipy.ndimage as snd

    rng = np.random.default_rng(5)
    im = rng.random((10, 11, 3)).astype(np.float64)
    ker = rng.random((5, 5))
    got = D.imconv_np(im, ker)
    want = snd.convolve(im, ker[:, :, None], mode="reflect")
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_noise_estimate_matches_torch_reference_math():
    rng = np.random.default_rng(6)
    noisy = rng.random((2, 16, 16, 3)).astype(np.float32)
    gt = rng.random((2, 16, 16, 3)).astype(np.float32)

    got = np.asarray(D.noise_estimate(jnp.asarray(noisy), jnp.asarray(gt), 7))

    # torch golden: depthwise gaussian filter of squared residual
    from virnet_tpu.ops.kernels import gaussian_filter_kernel
    ker = gaussian_filter_kernel(7).astype(np.float32)
    err2 = torch.from_numpy(((noisy - gt) ** 2).transpose(0, 3, 1, 2))
    kt = torch.from_numpy(np.tile(ker[None, None], (3, 1, 1, 1)))
    xp = F.pad(err2, (3,) * 4, mode="reflect")
    want = F.conv2d(xp, kt, groups=3).clamp_min(1e-10).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=1e-6)


def test_nearest_upsample_matches_torch():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    for sf in (2, 3, 4):
        got = np.asarray(U.nearest_upsample(jnp.asarray(x), sf))
        want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             scale_factor=sf, mode="nearest").numpy()
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1))


def test_nearest_resize_matches_torch():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 13, 9, 2)).astype(np.float32)
    for out_hw in [(7, 5), (4, 3), (13, 9)]:
        got = np.asarray(U.nearest_resize(jnp.asarray(x), *out_hw))
        want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                             size=out_hw, mode="nearest").numpy()
        np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1))


def test_conv_transpose_2x2_matches_torch():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 6, 5, 4)).astype(np.float32)
    w = rng.standard_normal((4, 3, 2, 2)).astype(np.float32)  # (in,out,kh,kw)
    b = rng.standard_normal(3).astype(np.float32)

    got = np.asarray(U.conv_transpose_2x2(
        jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 0, 1)), jnp.asarray(b)))
    want = F.conv_transpose2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                              torch.from_numpy(w), torch.from_numpy(b),
                              stride=2).numpy()
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=1e-5)


def test_degrade_batch_direct_vs_bicubic_shapes():
    x = jnp.ones((2, 32, 32, 3))
    ker = jnp.ones((2, 7, 7)) / 49.0
    for method, sf in [("direct", 2), ("bicubic", 4)]:
        out = D.degrade_batch(x, ker, sf, method)
        assert out.shape == (2, 32 // sf, 32 // sf, 3)


def test_conv_transpose_lax_variant_matches_einsum():
    """The UpBlock ConvT variant tools/bench_convt.py A/Bs on chip:
    lax.conv_transpose on the spatially-flipped kernel must equal the
    einsum formulation, so the swap (if it wins the timing) is safe."""
    from jax import lax

    from virnet_tpu.precision import get_precision

    rng = np.random.default_rng(10)
    x = rng.standard_normal((2, 6, 5, 4)).astype(np.float32)
    k = rng.standard_normal((2, 2, 4, 3)).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)

    want = np.asarray(U.conv_transpose_2x2(
        jnp.asarray(x), jnp.asarray(k), jnp.asarray(b)))
    got = np.asarray(lax.conv_transpose(
        jnp.asarray(x), jnp.asarray(k[::-1, ::-1]), strides=(2, 2),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=get_precision()) + jnp.asarray(b))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_transpose_impl_env_flag(monkeypatch):
    """The two conv_transpose_2x2 formulations (default = lax grad-conv,
    VIRNET_TPU_CONVT_IMPL=einsum opt-out) produce identical results, and
    the default routes through the lax path."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 2, 4, 3)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(3).astype(np.float32))

    monkeypatch.setenv("VIRNET_TPU_CONVT_IMPL", "einsum")
    want = np.asarray(U.conv_transpose_2x2(x, k, b))
    monkeypatch.setenv("VIRNET_TPU_CONVT_IMPL", "lax")
    got_lax = np.asarray(U.conv_transpose_2x2(x, k, b))
    monkeypatch.delenv("VIRNET_TPU_CONVT_IMPL", raising=False)
    got_default = np.asarray(U.conv_transpose_2x2(x, k, b))
    np.testing.assert_allclose(got_lax, want, atol=1e-5)
    np.testing.assert_array_equal(got_default, got_lax)
