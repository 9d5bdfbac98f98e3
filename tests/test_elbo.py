"""ELBO parity against independent torch computations of the same formulas."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from virnet_tpu.losses import elbo as E


def test_kl_gauss():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([0.0, 0.0, 0.0])
    got = float(E.kl_gauss(a, b, 2.0))
    want = 0.5 * np.mean(np.array([1.0, 4.0, 9.0]) / 2.0)
    assert abs(got - want) < 1e-6


def test_kl_inverse_gamma_torch_parity():
    rng = np.random.default_rng(0)
    beta_q = rng.random((4, 8)).astype(np.float32) + 0.1
    alpha_p = 23.5
    beta_p = rng.random((4, 8)).astype(np.float32) + 0.1

    got = float(E.kl_inverse_gamma(jnp.asarray(beta_q), alpha_p,
                                   jnp.asarray(beta_p)))
    bq, bp = torch.from_numpy(beta_q), torch.from_numpy(beta_p)
    want = (alpha_p * (bp.div(bq) - 1) + alpha_p * (bq.log() - bp.log())).mean()
    assert abs(got - float(want)) < 1e-4 * max(1.0, abs(float(want)))


def test_likelihood_denoising_torch_parity():
    rng = np.random.default_rng(1)
    x = rng.random((2, 8, 8, 3)).astype(np.float32)
    mu = rng.random((2, 8, 8, 3)).astype(np.float32)
    beta = rng.random((2, 8, 8, 1)).astype(np.float32) + 0.5
    alpha = 23.5
    var_q = 1e-6

    got = float(E.likelihood_denoising(jnp.asarray(x), jnp.asarray(mu),
                                       var_q, alpha, jnp.asarray(beta)))
    xt, mt, bt = map(torch.from_numpy, (x, mu, beta))
    at = torch.tensor(alpha)
    temp = 0.5 * (bt.log() - at.digamma()
                  + at.div(bt) * ((xt - mt) ** 2 + var_q))
    want = float(temp.mean() + 0.5 * math.log(2 * math.pi))
    assert abs(got - want) < 1e-5


def test_elbo_denoising_composition():
    rng = np.random.default_rng(2)
    shape = (2, 8, 8, 3)
    mu = jnp.asarray(rng.random(shape).astype(np.float32))
    sigma = jnp.asarray(rng.random((2, 8, 8, 1)).astype(np.float32) + 0.1)
    noisy = jnp.asarray(rng.random(shape).astype(np.float32))
    gt = jnp.asarray(rng.random(shape).astype(np.float32))
    alpha0 = jnp.asarray([24.5])
    beta0 = sigma * alpha0

    loss, lh, klg, klig = E.elbo_denoising(mu, sigma, noisy, gt, 1e-6,
                                           alpha0, beta0)
    total = float(lh) + float(klg) + float(klig)
    assert abs(float(loss) - total) < 1e-5 * max(1.0, abs(total))
    # multi-head list averages
    loss2, *_ = E.elbo_denoising([mu, mu], sigma, noisy, gt, 1e-6, alpha0,
                                 beta0)
    np.testing.assert_allclose(float(loss2), float(loss), rtol=1e-5)


def test_reparam_inv_gamma_moments():
    # Inv-Gamma(α, β) mean = β/(α-1); check the sampler is calibrated
    key = jax.random.PRNGKey(0)
    alpha, beta = 49.0, 2.0 * 50.0
    samples = E.reparam_inv_gamma(key, jnp.full((20000,), alpha),
                                  jnp.full((20000,), beta))
    mean = float(jnp.mean(samples))
    np.testing.assert_allclose(mean, beta / (alpha - 1), rtol=0.02)


def test_reparam_inv_gamma_has_gradients():
    key = jax.random.PRNGKey(1)

    def f(beta):
        return jnp.mean(E.reparam_inv_gamma(key, jnp.full((64,), 49.0), beta))

    g = jax.grad(f)(jnp.full((64,), 100.0))
    assert np.all(np.isfinite(np.asarray(g)))
    # d/dβ E[β/Γ] = 1/(α-1) ≈ 0.0208 — pathwise grads should be near that
    np.testing.assert_allclose(float(g.sum()), 1 / 48.0, rtol=0.05)


def test_reparam_cov_mat_spd_and_shapes():
    key = jax.random.PRNGKey(2)
    kinfo = jnp.array([[2.0, 1.0, 0.5], [1.5, 1.5, -0.3]])
    cov = E.reparam_cov_mat(key, kinfo, kappa0=50.0, rho_var=1e-4)
    assert cov.shape == (2, 2, 2)
    c = np.asarray(cov)
    np.testing.assert_allclose(c[:, 0, 1], c[:, 1, 0])
    dets = c[:, 0, 0] * c[:, 1, 1] - c[:, 0, 1] ** 2
    assert np.all(dets > 0)


def test_elbo_sisr_runs_and_decomposes():
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(4)
    sf = 2
    hr = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    lr = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    mu = hr + 0.01
    sigma_est = jnp.full((2, 1, 1, 1), 0.01)
    kinfo_est = jnp.array([[1.0, 1.0, 0.0], [2.0, 1.0, 0.2]])
    kinfo_gt = jnp.array([[1.1, 0.9, 0.0], [1.8, 1.2, 0.1]])
    sigma_prior = jnp.full((2, 1, 1, 1), 0.01)
    alpha0 = jnp.asarray([40.5])

    loss, aux = E.elbo_sisr(key, mu, sigma_est, kinfo_est, hr, lr,
                            sigma_prior, alpha0, kinfo_gt, kappa0=50.0,
                            r2=1e-4, eps2=1e-5, sf=sf, k_size=21,
                            penalty_K=(0.02, 2.0), shift=False,
                            downsampler="bicubic")
    total = (float(aux["lh"]) + float(aux["kl_rnet"]) + float(aux["kl_snet"])
             + float(aux["kl_knet"]))
    assert abs(float(loss) - total) < 1e-4
    assert aux["kernel"].shape == (2, 21, 21)
    assert np.isfinite(float(loss))


def test_elbo_sisr_gradients_flow():
    key = jax.random.PRNGKey(5)
    sf = 2
    hr = jnp.ones((1, 16, 16, 3)) * 0.5
    lr = jnp.ones((1, 8, 8, 3)) * 0.5

    def f(kinfo_est):
        loss, _ = E.elbo_sisr(
            key, hr, jnp.full((1, 1, 1, 1), 0.01), kinfo_est, hr, lr,
            jnp.full((1, 1, 1, 1), 0.01), jnp.asarray([40.5]),
            jnp.array([[1.0, 1.0, 0.0]]), 50.0, 1e-4, 1e-5, sf, 21,
            (0.02, 2.0), False, "direct")
        return loss

    g = jax.grad(f)(jnp.array([[1.5, 1.2, 0.1]]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)
