"""Device metrics must agree with the host (golden) protocol scorers."""

import jax.numpy as jnp
import numpy as np

from virnet_tpu.eval.metrics import batch_psnr, batch_ssim
from virnet_tpu.eval.metrics_device import (batch_psnr_device,
                                            batch_ssim_device)


def _pair(seed=0, n=3, h=48, w=56):
    rng = np.random.default_rng(seed)
    clean = rng.random((n, h, w, 3)).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, 0.05, clean.shape), 0,
                    1).astype(np.float32)
    return noisy, clean


def test_psnr_device_matches_host():
    noisy, clean = _pair()
    got = np.asarray(batch_psnr_device(jnp.asarray(noisy),
                                       jnp.asarray(clean)))
    for i in range(noisy.shape[0]):
        want = batch_psnr(noisy[i:i + 1], clean[i:i + 1])
        assert abs(got[i] - want) < 1e-3, (got[i], want)


def test_ssim_device_matches_host():
    noisy, clean = _pair(1)
    got = np.asarray(batch_ssim_device(jnp.asarray(noisy),
                                       jnp.asarray(clean)))
    for i in range(noisy.shape[0]):
        want = batch_ssim(noisy[i:i + 1], clean[i:i + 1])
        assert abs(got[i] - want) < 1e-4, (got[i], want)


def test_device_metrics_ycbcr_border():
    noisy, clean = _pair(2)
    got_p = np.asarray(batch_psnr_device(jnp.asarray(noisy),
                                         jnp.asarray(clean), border=4,
                                         ycbcr=True))
    got_s = np.asarray(batch_ssim_device(jnp.asarray(noisy),
                                         jnp.asarray(clean), border=4,
                                         ycbcr=True))
    for i in range(noisy.shape[0]):
        want_p = batch_psnr(noisy[i:i + 1], clean[i:i + 1], border=4,
                            ycbcr=True)
        want_s = batch_ssim(noisy[i:i + 1], clean[i:i + 1], border=4,
                            ycbcr=True)
        assert abs(got_p[i] - want_p) < 2e-3
        assert abs(got_s[i] - want_s) < 2e-4
