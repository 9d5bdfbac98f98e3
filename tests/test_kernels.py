import numpy as np
import jax.numpy as jnp

from virnet_tpu.ops import kernels as K


def test_sigma2kernel_normalized_and_symmetric():
    cov = jnp.array([[[2.0, 0.0], [0.0, 2.0]]])
    ker = np.asarray(K.sigma2kernel(cov, k_size=21, sf=3, shift=False))[0]
    assert abs(ker.sum() - 1.0) < 1e-6
    np.testing.assert_allclose(ker, ker.T, atol=1e-7)          # isotropic
    np.testing.assert_allclose(ker, ker[::-1, ::-1], atol=1e-7)  # centered


def test_sigma2kernel_vs_direct_softmax():
    # independent direct computation of the quadratic-form softmax
    lam1, lam2, rho = 2.5, 1.2, 0.4
    d = rho * np.sqrt(lam1 * lam2)
    cov_np = np.array([[lam1, d], [d, lam2]])
    inv = np.linalg.inv(cov_np)
    k = 15
    c = k // 2
    vals = np.zeros((k, k))
    for i in range(k):
        for j in range(k):
            z = np.array([i - c, j - c], dtype=np.float64)
            vals[i, j] = -0.5 * z @ inv @ z
    want = np.exp(vals - vals.max())
    want /= want.sum()

    got = np.asarray(K.sigma2kernel(jnp.asarray(cov_np)[None], k_size=k,
                                    sf=2, shift=False))[0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_np_twin_transposed_convention():
    # the host twin uses (col, row) coordinates; with theta=0 its kernel is
    # the transpose of the in-graph kernel built from diag(λ1, λ2)
    lam1, lam2 = 4.0, 1.0
    ker_np, kinfo = K.anisotropic_gaussian_np(k_size=21, sf=2,
                                              lambda_1=lam1, lambda_2=lam2,
                                              theta=0.0, shift=False)
    np.testing.assert_allclose(kinfo, [lam1, lam2, 0.0], atol=1e-12)
    cov = jnp.array([[[lam1, 0.0], [0.0, lam2]]])
    ker_t = np.asarray(K.sigma2kernel(cov, 21, 2, False))[0]
    np.testing.assert_allclose(ker_np, ker_t.T, atol=1e-6)


def test_kinfo_roundtrip():
    kinfo = jnp.array([[2.0, 1.5, 0.3]])
    ker = np.asarray(K.kinfo2kernel(kinfo, k_size=13, sf=3, shift=True))[0]
    assert abs(ker.sum() - 1.0) < 1e-6


def test_shifted_center_moves_mass():
    cov = jnp.array([[[1.0, 0.0], [0.0, 1.0]]])
    k_ns = np.asarray(K.sigma2kernel(cov, 21, 4, shift=False))[0]
    k_sh = np.asarray(K.sigma2kernel(cov, 21, 4, shift=True))[0]
    # shifted center = 10 + 0.5*(4-1) = 11.5 → center of mass moves +1.5
    com_ns = (np.arange(21) * k_ns.sum(1)).sum()
    com_sh = (np.arange(21) * k_sh.sum(1)).sum()
    np.testing.assert_allclose(com_sh - com_ns, 1.5, atol=1e-4)


def test_tidy_kernel_pad_and_crop():
    ker, _ = K.anisotropic_gaussian_np(k_size=11, sf=2, lambda_1=1.0,
                                       lambda_2=1.0, theta=0.0, shift=False)
    padded = K.tidy_kernel(ker, 21)
    assert padded.shape == (21, 21)
    np.testing.assert_allclose(padded[5:16, 5:16], ker)
    cropped = K.tidy_kernel(padded, 11)
    np.testing.assert_allclose(cropped, ker / ker.sum(), atol=1e-12)


def test_gaussian_filter_kernel_matches_cv2():
    # the reference passes the OpenCV size-rule sigma explicitly
    # (utils/util_denoising.py:30), which selects cv2's formula branch
    import cv2

    for ksize in (7, 9, 11):
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
        k1 = cv2.getGaussianKernel(ksize, sigma)
        want = np.outer(k1, k1)
        want /= want.sum()
        got = K.gaussian_filter_kernel(ksize)
        np.testing.assert_allclose(got, want, atol=1e-12)
