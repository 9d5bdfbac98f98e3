"""Bit-level parity of our seeded eval-data pipelines against the ACTUAL
reference implementation executed from /root/reference (skipped when the
reference tree isn't mounted).

We import the reference's modules read-only and run them on CPU; missing
third-party deps of the reference (skimage, lmdb) are shimmed with
equivalents.  This pins the exact noise fields / kernels / degradations the
±0.01 dB PSNR-parity target depends on.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference modules with dependency shims, restoring sys.path."""
    from virnet_tpu.ops.quant import (img_as_float32, img_as_float64,
                                      img_as_ubyte)

    # shim skimage (only the converters the reference uses)
    skimage = types.ModuleType("skimage")
    skimage.img_as_float32 = img_as_float32
    skimage.img_as_float64 = img_as_float64
    skimage.img_as_ubyte = img_as_ubyte
    skimage.img_as_float = img_as_float64
    # shim lmdb + lpips (imported at module top; unused in what we run)
    lmdb = types.ModuleType("lmdb")
    lmdb.open = None
    lpips = types.ModuleType("lpips")
    lpips.LPIPS = None

    saved = {k: sys.modules.get(k) for k in ("skimage", "lmdb", "lpips")}
    sys.modules["skimage"] = skimage
    sys.modules["lmdb"] = lmdb
    sys.modules["lpips"] = lpips
    sys.path.insert(0, str(REF))
    try:
        import utils.util_denoising as ref_ud  # noqa: PLC0415
        import utils.util_image as ref_ui  # noqa: PLC0415
        import utils.util_sisr as ref_us  # noqa: PLC0415
        yield dict(util_denoising=ref_ud, util_sisr=ref_us,
                   util_image=ref_ui)
    finally:
        sys.path.remove(str(REF))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_sigma_fields_bitexact(ref_modules):
    from virnet_tpu.ops import sigma_fields as F

    ref = ref_modules["util_denoising"]
    np.testing.assert_array_equal(F.peaks(256), ref.peaks(256))
    np.testing.assert_array_equal(F.sincos_kernel(), ref.sincos_kernel())

    rng1 = np.random.default_rng(1000)
    rng2 = np.random.default_rng(1000)
    ours = F.gauss_kernel_mix(256, 256, rng1)
    theirs = ref.generate_gauss_kernel_mix(256, 256, rng2)
    np.testing.assert_array_equal(ours, theirs)
    # the two generators consumed identical stream state
    np.testing.assert_array_equal(rng1.standard_normal(8),
                                  rng2.standard_normal(8))


def test_gaussian_bump_bitexact(ref_modules):
    from virnet_tpu.ops.sigma_fields import gaussian_bump

    ref = ref_modules["util_denoising"]
    got = gaussian_bump(128, 128, (37.5, 90.2), 45.0)
    want = ref.getGaussianKernel2DCenter(128, 128, [37.5, 90.2], 45.0)
    np.testing.assert_array_equal(got, want)


def test_anisotropic_kernel_bitexact(ref_modules):
    from virnet_tpu.ops.kernels import anisotropic_gaussian_np

    ref = ref_modules["util_sisr"]
    for l1, l2, th, shift, sf in [(1.44, 1.44, 0.0, False, 2),
                                  (2.56, 0.64, 0.7, False, 4),
                                  (1.2, 5.0, 2.1, True, 3)]:
        got_k, got_i = anisotropic_gaussian_np(21, sf, l1, l2, th, shift)
        want_k, want_i = ref.shifted_anisotropic_Gaussian(21, sf, l1, l2,
                                                          th, shift)
        np.testing.assert_allclose(got_k, want_k, atol=1e-12)
        np.testing.assert_allclose(got_i, want_i, atol=1e-12)


def test_sigma2kernel_matches_reference_torch(ref_modules):
    import jax.numpy as jnp
    import torch

    from virnet_tpu.ops.kernels import sigma2kernel

    ref = ref_modules["util_sisr"]
    cov = np.array([[[2.0, 0.5], [0.5, 1.2]],
                    [[1.0, -0.3], [-0.3, 3.0]]], dtype=np.float32)
    for shift, sf, k in [(False, 3, 21), (True, 4, 15)]:
        want = ref.sigma2kernel(
            torch.from_numpy(cov).unsqueeze(1), k, sf, shift).numpy()[:, 0]
        got = np.asarray(sigma2kernel(jnp.asarray(cov), k, sf, shift))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_degrade_np_bitexact(ref_modules):
    from virnet_tpu.ops.degrade import degrade_np
    from virnet_tpu.ops.kernels import anisotropic_gaussian_np

    ref = ref_modules["util_sisr"]
    rng = np.random.default_rng(0)
    im = rng.random((48, 52, 3)).astype(np.float32)
    kernel, _ = anisotropic_gaussian_np(21, 4, 2.0, 1.0, 0.4, False)

    for down in ("direct", "bicubic"):
        got = degrade_np(im, kernel, sf=4, nlevel=2.55, qf=None, seed=1234,
                         downsampler=down)
        want = ref.degrade_virnet(im, kernel=kernel, sf=4, nlevel=2.55,
                                  qf=None, seed=1234, downsampler=down)
        np.testing.assert_allclose(got, want, atol=2e-7)


def test_resize_matches_reference_resizeright(ref_modules):
    from virnet_tpu.ops.resize import resize_np

    sys.path.insert(0, str(REF))
    try:
        from ResizeRight.resize_right import resize as ref_resize
    finally:
        sys.path.remove(str(REF))

    rng = np.random.default_rng(3)
    im = rng.random((37, 41, 3))
    for scale in (0.5, 0.25, 1 / 3):
        got = resize_np(im, scale_factors=scale, axes=(0, 1))
        want = ref_resize(im, scale_factors=scale)
        np.testing.assert_allclose(got, want, atol=1e-12)
    # upscale too
    got = resize_np(im, scale_factors=2.0, axes=(0, 1))
    want = ref_resize(im, scale_factors=2.0)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_metrics_match_reference(ref_modules):
    ref_ui = ref_modules["util_image"]

    from virnet_tpu.eval.metrics import calculate_psnr, calculate_ssim
    from virnet_tpu.ops.color import rgb2ycbcr_np

    rng = np.random.default_rng(4)
    a = rng.integers(0, 255, (64, 72, 3), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-20, 20, a.shape), 0,
                255).astype(np.uint8)

    assert abs(calculate_psnr(a, b) - ref_ui.calculate_psnr(a, b)) < 1e-12
    assert abs(calculate_ssim(a, b) - ref_ui.calculate_ssim(a, b)) < 1e-12
    assert abs(calculate_psnr(a, b, border=4, ycbcr=True)
               - ref_ui.calculate_psnr(a, b, border=4, ycbcr=True)) < 1e-12
    assert abs(calculate_ssim(a, b, border=4, ycbcr=True)
               - ref_ui.calculate_ssim(a, b, border=4, ycbcr=True)) < 1e-12
    np.testing.assert_array_equal(rgb2ycbcr_np(a, True),
                                  ref_ui.rgb2ycbcr(a, True))
