"""Optimizer stack: warmup+cosine epoch schedule and per-subnet grad clipping.

Schedule semantics replicate GradualWarmupScheduler(multiplier=1) wrapping
CosineAnnealingLR (reference train_denoising_syn.py:77-85 +
gradual_warmup_lr/warmup_scheduler/scheduler.py:25-37), stepped per *epoch*:

    lr(e) = base * (e+1)/warmup                      e <  warmup
    lr(e) = ηmin + (base-ηmin)(1+cos(π e'/T))/2      e >= warmup,
            e' = e - warmup, T = epochs - warmup

Per-subnet clipping replicates the reference's separate
``clip_grad_norm_(param_R/S/K)`` calls (train_denoising_syn.py:182-183,
train_SISR.py:226-228): the global norm is computed and clipped
independently over each top-level parameter subtree.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_epoch_schedule(base_lr: float, lr_min: float, epochs: int,
                                 warmup_epochs: int, steps_per_epoch: int):
    """optax schedule(step) with LR constant within each epoch."""
    t_max = max(epochs - warmup_epochs, 1)

    def schedule(step):
        epoch = step // steps_per_epoch
        warm = base_lr * (epoch + 1.0) / max(warmup_epochs, 1)
        e_cos = jnp.maximum(epoch - warmup_epochs, 0)
        cos = lr_min + 0.5 * (base_lr - lr_min) * (
            1.0 + jnp.cos(math.pi * e_cos / t_max))
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def clip_by_subtree_norm(clip_map: Dict[str, float]) -> optax.GradientTransformation:
    """Clip the global grad norm of each top-level subtree independently.

    clip_map: {'rnet': 1e3, 'snet': 1e2, ...}; subtrees not listed pass
    through unclipped.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip_subtree(tree, max_norm):
            g_norm = optax.global_norm(tree)
            scale = jnp.minimum(1.0, max_norm / (g_norm + 1e-6))
            return jax.tree_util.tree_map(lambda g: g * scale, tree)

        new_updates = dict(updates)
        for name, max_norm in clip_map.items():
            if name in new_updates:
                new_updates[name] = clip_subtree(new_updates[name], max_norm)
        return new_updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def subtree_grad_norms(grads) -> Dict[str, jnp.ndarray]:
    """Pre-clip gradient norms per top-level subtree (for logging, as the
    reference logs GNorm_D / GNorm_S)."""
    return {k: optax.global_norm(v) for k, v in grads.items()}


def build_optimizer(base_lr: float, lr_min: float, epochs: int,
                    warmup_epochs: int, steps_per_epoch: int,
                    clip_map: Optional[Dict[str, float]] = None):
    """clip-per-subnet -> Adam with the warmup+cosine epoch schedule.

    Returns (optax transformation, schedule fn).
    """
    schedule = warmup_cosine_epoch_schedule(base_lr, lr_min, epochs,
                                            warmup_epochs, steps_per_epoch)
    chain = []
    if clip_map:
        chain.append(clip_by_subtree_norm(clip_map))
    chain.append(optax.adam(schedule))
    return optax.chain(*chain), schedule
