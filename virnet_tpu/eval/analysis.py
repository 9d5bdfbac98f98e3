"""Model analysis: parameter counts, FLOPs, wall-clock timing.

Equivalents of the reference's thop/CUDA-event tooling
(utils/util_net.py:10-18, 82-98): parameters from the pytree, FLOPs from
XLA's own cost analysis of the compiled executable (more faithful than
per-module op counting), and timing that ends in a host fetch (the
tunneled TPU backend acks async work before executing — see
.claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import numpy as np


def calculate_parameters(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


def calculate_flops(fn: Callable, *args) -> float:
    """FLOPs of one call of ``fn(*args)`` per XLA's cost analysis."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):           # one entry per device program
        cost = cost[0]
    return float(cost.get("flops", 0.0))


def measure_time(fn: Callable, args, num_forward: int = 100) -> float:
    """Mean seconds per call, chained with a final host fetch."""
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])    # warm + sync
    tic = time.perf_counter()
    for _ in range(num_forward):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    toc = time.perf_counter()
    return (toc - tic) / num_forward


def schedule_preview(schedule: Callable, epochs: int,
                     steps_per_epoch: int) -> Dict[int, float]:
    """Per-epoch learning rates (reference util_net.test_scheduler)."""
    return {e: float(schedule(e * steps_per_epoch))
            for e in range(epochs)}


def calculate_eta_min(epochs: int, eta_max: float, lr_min: float,
                      t_max: int) -> float:
    """Given the desired final LR, solve for the cosine schedule's eta_min
    (reference utils/util_net.py:67-74)."""
    import math

    coef = 0.5 * (1 + math.cos((epochs - 1) / t_max * math.pi))
    return (lr_min - eta_max * coef) / (1 - coef)
