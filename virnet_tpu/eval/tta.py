"""Flip/rotation test-time augmentation.

The reference runs the 8 dihedral orientations sequentially per block
(scripts/denoising_virnet_real_sidd.py:121-136).  Here all 8 orientations
are stacked into the batch axis and restored by ONE compiled forward — an
8x batching win on TPU where the conv stack is throughput-bound.
Requires square inputs (true for all TTA call sites: 256^2 SIDD blocks,
512^2 DND crops).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..ops.augment import dihedral_stack, dihedral_unstack_mean


def tta_x8(forward: Callable[[jnp.ndarray], jnp.ndarray],
           x: jnp.ndarray) -> jnp.ndarray:
    """forward: NHWC -> NHWC restore fn; x: (N, H, W, C) with H == W.

    Returns the mean over the 8 inverse-mapped orientation outputs.
    """
    n, h, w, c = x.shape
    assert h == w, "x8 TTA requires square inputs"
    stack = dihedral_stack(x)                       # (8, N, H, W, C)
    flat = stack.reshape(8 * n, h, w, c)
    out = forward(flat)
    out8 = out.reshape(8, n, h, w, out.shape[-1])
    return dihedral_unstack_mean(out8)
