"""Evidence-lower-bound objectives (reference: loss/ELBO_simple.py).

The posteriors are parameterized by the three networks:
  * q(Z)  = N(mu, eps2)           — RNet output, fixed small variance
  * q(σ²) = Inv-Gamma(α0-1, σ̂·α0) — SNet output scales the prior shape
  * q(λi) = Inv-Gamma(κ0-1, κ0·λ̂i), q(ρ) = N(ρ̂, r²) — KNet output (SISR)

All sampling is reparameterized in-graph: Gaussian via key-split normals,
Inverse-Gamma via jax.random.gamma (implicit reparameterization gradients,
the JAX analogue of torch's Gamma.rsample).  The SISR likelihood
differentiates through kernel synthesis + per-sample blur + antialiased
bicubic downsampling every step (reference loss/ELBO_simple.py:55-59,
124-134).
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma

from ..ops.degrade import degrade_batch
from ..ops.kernels import sigma2kernel

Array = jnp.ndarray
MuLike = Union[Array, List[Array]]

_HALF_LOG_2PI = 0.5 * math.log(2 * math.pi)


def kl_inverse_gamma(beta_q: Array, alpha_p, beta_p) -> Array:
    """Simplified Inv-Gamma/Inv-Gamma KL, mean-reduced (reference
    loss/ELBO_simple.py:12-14)."""
    out = alpha_p * (beta_p / beta_q - 1.0) + alpha_p * (
        jnp.log(beta_q) - jnp.log(beta_p))
    return out.mean()


def kl_gauss(mu_q: Array, mu_p: Array, var_p) -> Array:
    """0.5 * mean((mu_q - mu_p)^2 / var_p)."""
    return 0.5 * ((mu_q - mu_p) ** 2 / var_p).mean()


def likelihood_denoising(x: Array, mu_q: Array, var_q, alpha_q,
                         beta_q: Array) -> Array:
    """Gaussian likelihood under the Inv-Gamma noise posterior (reference
    loss/ELBO_simple.py:18-21)."""
    temp = 0.5 * (jnp.log(beta_q) - digamma(alpha_q)
                  + alpha_q / beta_q * ((x - mu_q) ** 2 + var_q))
    return temp.mean() + _HALF_LOG_2PI


def _as_list(mu: MuLike) -> List[Array]:
    return list(mu) if isinstance(mu, (list, tuple)) else [mu]


def elbo_denoising(mu: MuLike, sigma_est: Array, im_noisy: Array,
                   im_gt: Array, eps2: float, alpha0: Array,
                   beta0: Array) -> Tuple[Array, Array, Array, Array]:
    """Denoising ELBO (reference loss/ELBO_simple.py:23-53).

    Returns (loss, likelihood, kl_gauss, kl_inv_gamma).
    """
    mus = _as_list(mu)
    klg = sum(kl_gauss(m, im_gt, eps2) for m in mus) / len(mus)

    beta = sigma_est * alpha0
    klig = kl_inverse_gamma(beta, alpha0 - 1, beta0)

    lh = sum(likelihood_denoising(im_noisy, m, eps2, alpha0 - 1, beta)
             for m in mus) / len(mus)

    loss = lh + klg + klig
    return loss, lh, klg, klig


def reparam_inv_gamma(key: Array, alpha: Array, beta: Array) -> Array:
    """Pathwise Inverse-Gamma sample: 1 / Gamma(alpha, rate=beta)."""
    g = jax.random.gamma(key, alpha)          # standard Gamma(alpha, 1)
    return beta / g


def reparam_cov_mat(key: Array, kinfo_est: Array, kappa0: float,
                    rho_var: float) -> Array:
    """Resample the 2x2 kernel covariance (reference
    loss/ELBO_simple.py:66-80).

    kinfo_est: (N, 3) = (λ1, λ2, ρ).  The off-diagonal uses stop-gradient
    square roots of the resampled variances (as the reference detaches).
    Returns (N, 2, 2).
    """
    k_ig, k_rho = jax.random.split(key)
    alpha_k = jnp.full_like(kinfo_est[:, :2], kappa0 - 1.0)
    beta_k = kinfo_est[:, :2] * kappa0
    k_var = reparam_inv_gamma(k_ig, alpha_k, beta_k)          # N x 2
    v1, v2 = k_var[:, 0], k_var[:, 1]

    rho_mean = kinfo_est[:, 2]
    rho = rho_mean + math.sqrt(rho_var) * jax.random.normal(
        k_rho, rho_mean.shape, dtype=kinfo_est.dtype)
    direction = (jnp.sqrt(jax.lax.stop_gradient(v1))
                 * jnp.sqrt(jax.lax.stop_gradient(v2))
                 * jnp.clip(rho, -1.0, 1.0))
    cov = jnp.stack(
        [jnp.stack([v1, direction], axis=-1),
         jnp.stack([direction, v2], axis=-1)], axis=-2)
    return cov


def likelihood_sisr(key: Array, x_lr: Array, kernels: Array, sf: int,
                    mu_q: Array, var_q: float, alpha_q, beta_q: Array,
                    downsampler: str) -> Array:
    """Degradation-consistency likelihood: sample z ~ q(Z), degrade with the
    resampled kernel, score against the LR input (reference
    loss/ELBO_simple.py:55-59)."""
    zz = mu_q + jax.random.normal(key, mu_q.shape, mu_q.dtype) * math.sqrt(var_q)
    zz_blur = degrade_batch(zz, kernels, sf, downsampler, correlate=True)
    out = (_HALF_LOG_2PI + 0.5 * (jnp.log(beta_q) - digamma(alpha_q))
           + 0.5 * alpha_q / beta_q * (x_lr - zz_blur) ** 2)
    return out.mean()


def elbo_sisr(key: Array,
              mu: MuLike,
              sigma_est: Array,
              kinfo_est: Array,
              im_hr: Array,
              im_lr: Array,
              sigma_prior: Array,
              alpha0: Array,
              kinfo_gt: Array,
              kappa0: float,
              r2: float,
              eps2: float,
              sf: int,
              k_size: int,
              penalty_K: Sequence[float],
              shift: bool,
              downsampler: str):
    """SISR ELBO (reference loss/ELBO_simple.py:82-138).

    Returns (loss, aux) where aux = dict(lh, kl_rnet, kl_snet, kl_knet,
    kl_knet0, kl_knet1, kl_knet2, kernel).
    """
    k_cov_key, lh_key = jax.random.split(key)

    mus = _as_list(mu)
    kl_rnet = sum(kl_gauss(m, im_hr, eps2) for m in mus) / len(mus)

    beta0 = sigma_prior * alpha0
    beta = sigma_est * alpha0
    kl_snet = kl_inverse_gamma(beta, alpha0 - 1, beta0)

    kl_knet0 = kl_inverse_gamma(kappa0 * kinfo_est[:, 0], kappa0 - 1,
                                kappa0 * kinfo_gt[:, 0])
    kl_knet1 = kl_inverse_gamma(kappa0 * kinfo_est[:, 1], kappa0 - 1,
                                kappa0 * kinfo_gt[:, 1])
    kl_knet2 = kl_gauss(kinfo_est[:, 2], kinfo_gt[:, 2], r2) * penalty_K[0]
    kl_knet = (kl_knet0 + kl_knet1 + kl_knet2) / 3 * penalty_K[1]

    k_cov = reparam_cov_mat(k_cov_key, kinfo_est, kappa0, r2)
    kernels = sigma2kernel(k_cov, k_size, sf, shift)           # N x k x k

    lh_keys = jax.random.split(lh_key, len(mus))
    lh = sum(likelihood_sisr(kk, im_lr, kernels, sf, m, eps2, alpha0 - 1,
                             beta, downsampler)
             for kk, m in zip(lh_keys, mus)) / len(mus)

    loss = lh + kl_rnet + kl_snet + kl_knet
    aux = dict(lh=lh, kl_rnet=kl_rnet, kl_snet=kl_snet, kl_knet=kl_knet,
               kl_knet0=kl_knet0, kl_knet1=kl_knet1, kl_knet2=kl_knet2,
               kernel=kernels)
    return loss, aux
