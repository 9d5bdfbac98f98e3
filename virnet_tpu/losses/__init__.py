from .elbo import (  # noqa: F401
    elbo_denoising,
    elbo_sisr,
    kl_gauss,
    kl_inverse_gamma,
    likelihood_denoising,
    reparam_cov_mat,
    reparam_inv_gamma,
)
