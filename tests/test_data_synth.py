"""On-device data synthesis: distributional + structural checks against the
reference's documented sampling scheme."""

import jax
import jax.numpy as jnp
import numpy as np

from virnet_tpu.data.denoise_synth import (generate_sigma_iid,
                                           generate_sigma_niid,
                                           synthesize_noisy_batch)
from virnet_tpu.data.sisr_synth import (sample_kernel_params,
                                        synthesize_sisr_batch)


def test_sigma_niid_range_and_shape():
    key = jax.random.PRNGKey(0)
    sigma = np.asarray(generate_sigma_niid(key, 16, 64))
    assert sigma.shape == (16, 64, 64, 1)
    # σ ∈ [down, up] ⊂ [0, 80/255]
    assert sigma.min() >= 0.0
    assert sigma.max() <= 80.0 / 255.0 + 1e-6
    # per-sample fields span [down, up]: max > min for all samples
    per_min = sigma.min(axis=(1, 2, 3))
    per_max = sigma.max(axis=(1, 2, 3))
    assert np.all(per_max - per_min > 1e-4)


def test_sigma_iid_constant_per_sample():
    key = jax.random.PRNGKey(1)
    sigma = np.asarray(generate_sigma_iid(key, 8, 32))
    assert sigma.shape == (8, 32, 32, 1)
    assert np.all(sigma.std(axis=(1, 2, 3)) < 1e-6)
    assert len(np.unique(sigma[:, 0, 0, 0])) == 8


def test_synthesize_noisy_batch():
    key = jax.random.PRNGKey(2)
    gt = jnp.full((4, 32, 32, 3), 0.5)
    noisy, sigma2 = synthesize_noisy_batch(key, gt, mode="niid")
    assert noisy.shape == gt.shape
    assert sigma2.shape == (4, 32, 32, 1)
    assert np.asarray(sigma2).min() >= 1e-10
    # empirical noise std should correlate with sigma map
    res = np.asarray(noisy - gt)
    s = np.sqrt(np.asarray(sigma2))[..., 0]
    ratio = np.abs(res[..., 0]).mean() / s.mean()
    # E|N(0,σ)| = σ sqrt(2/π) ≈ 0.798 σ
    assert 0.6 < ratio < 1.0


def test_sample_kernel_params_distribution():
    key = jax.random.PRNGKey(3)
    cov, kinfo = sample_kernel_params(key, 4096, sf=4)
    cov = np.asarray(cov)
    kinfo = np.asarray(kinfo)
    # SPD and consistent with kinfo
    dets = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] ** 2
    assert np.all(dets > 0)
    np.testing.assert_allclose(kinfo[:, 0], cov[:, 0, 0], rtol=1e-5)
    np.testing.assert_allclose(
        kinfo[:, 2], cov[:, 0, 1] / np.sqrt(cov[:, 0, 0] * cov[:, 1, 1]),
        atol=1e-5)
    # eigenvalues lie in [0.2², 4²] (λ ∈ [0.2, sf] before squaring)
    tr = cov[:, 0, 0] + cov[:, 1, 1]
    disc = np.sqrt(np.maximum((cov[:, 0, 0] - cov[:, 1, 1]) ** 2
                              + 4 * cov[:, 0, 1] ** 2, 0))
    eig_min = (tr - disc) / 2
    eig_max = (tr + disc) / 2
    assert eig_min.min() >= 0.2 ** 2 - 1e-4
    assert eig_max.max() <= 4.0 ** 2 + 1e-3
    # ~30% isotropic (λ2 == λ1)
    iso_frac = np.mean(np.abs(eig_max - eig_min) < 1e-6)
    assert 0.2 < iso_frac < 0.4


def test_synthesize_sisr_batch_shapes():
    key = jax.random.PRNGKey(4)
    hr = jnp.full((2, 48, 48, 3), 0.5)
    batch = synthesize_sisr_batch(key, hr, sf=2, k_size=11)
    assert batch.im_lr.shape == (2, 24, 24, 3)
    assert batch.im_blur.shape == (2, 24, 24, 3)
    assert batch.kinfo.shape == (2, 3)
    assert batch.nlevel.shape == (2, 1)
    lr = np.asarray(batch.im_lr)
    assert lr.min() >= 0.0 and lr.max() <= 1.0


def test_sisr_synth_matches_host_pipeline():
    """On-device degradation must match the host (scipy) pipeline for a
    fixed kernel: same symmetric padding + true convolution semantics."""
    import scipy.ndimage as snd

    from virnet_tpu.data.sisr_synth import blur_symmetric_convolve
    from virnet_tpu.ops.kernels import anisotropic_gaussian_np

    rng = np.random.default_rng(5)
    im = rng.random((20, 20, 3)).astype(np.float32)
    kernel, _ = anisotropic_gaussian_np(k_size=7, sf=2, lambda_1=1.5,
                                        lambda_2=0.8, theta=0.6, shift=False)
    got = np.asarray(blur_symmetric_convolve(
        jnp.asarray(im[None]), jnp.asarray(kernel[None].astype(np.float32))))[0]
    want = snd.convolve(im.astype(np.float64), kernel[:, :, None],
                        mode="reflect")
    np.testing.assert_allclose(got, want, atol=1e-5)
