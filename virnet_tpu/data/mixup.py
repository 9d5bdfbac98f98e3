"""MixUp augmentation for real-noise training (reference
datasets/data_tools.py:12-30, applied train_denoising_real.py:163).

In-graph version: a Beta(0.6, 0.6) mixing coefficient per sample and a
random batch permutation blend (gt, noisy) pairs consistently.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mixup_pairs(key: jax.Array, im_gt: jnp.ndarray, im_noisy: jnp.ndarray,
                alpha: float = 0.6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k_perm, k_lam = jax.random.split(key)
    bs = im_gt.shape[0]
    indices = jax.random.permutation(k_perm, bs)
    lam = jax.random.beta(k_lam, alpha, alpha, (bs, 1, 1, 1),
                          dtype=im_gt.dtype)
    gt2 = im_gt[indices]
    noisy2 = im_noisy[indices]
    return (lam * im_gt + (1 - lam) * gt2,
            lam * im_noisy + (1 - lam) * noisy2)
