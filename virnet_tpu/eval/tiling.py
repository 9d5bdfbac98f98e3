"""Large-image inference: pad buckets + overlapped 4-quadrant tiling.

Two mechanisms, both keeping shapes static under jit:

* pad-bucket inference — arbitrary-size inputs are reflect-padded up to the
  next size in a geometric bucket grid so only a few executables are ever
  compiled (the reference instead re-runs eagerly per size);
* ``forward_chop`` — recursive overlap-shave 4-quadrant tiling for images
  too big for one pass (reference utils/util_net.py:27-65), with the
  per-level tile sizes computed on host so each level is a fixed-shape
  batched forward of 4 tiles.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def bucket_size(n: int, multiple: int = 64,
                buckets: Sequence[int] = ()) -> int:
    """Smallest bucket >= n: explicit bucket list if given, else next
    multiple.  multiple <= 1 means exact (no bucketing)."""
    for b in buckets:
        if b >= n:
            return b
    if multiple <= 1:
        return n
    return int(math.ceil(n / multiple) * multiple)


def padded_forward(forward: Callable, x: jnp.ndarray,
                   multiple: int = 64, sf: int = 1) -> jnp.ndarray:
    """Reflect-pad NHWC input to a bucketed size, run, crop the output
    (accounting for an integer output scale factor)."""
    n, h, w, c = x.shape
    hb = bucket_size(h, multiple)
    wb = bucket_size(w, multiple)
    if hb != h or wb != w:
        x = jnp.pad(x, ((0, 0), (0, hb - h), (0, wb - w), (0, 0)),
                    mode="reflect")
    out = forward(x)
    return out[:, :h * sf, :w * sf, :]


def forward_chop(forward: Callable, x: jnp.ndarray, sf: int = 1,
                 shave: int = 10, min_size: int = 160000) -> jnp.ndarray:
    """Recursive overlap-shave tiled inference (NHWC).

    Splits into 4 overlapping quadrants; quadrants small enough run as ONE
    batched forward of 4 tiles (same compiled shape), larger ones recurse.
    """
    n, h, w, c = x.shape
    h_half, w_half = h // 2, w // 2
    h_size, w_size = h_half + shave, w_half + shave

    tiles = [
        x[:, :h_size, :w_size, :],
        x[:, :h_size, w - w_size:, :],
        x[:, h - h_size:, :w_size, :],
        x[:, h - h_size:, w - w_size:, :],
    ]

    if h_size * w_size < min_size:
        batched = jnp.concatenate(tiles, axis=0)
        out = forward(batched)
        outs = jnp.split(out, 4, axis=0)
    else:
        outs = [forward_chop(forward, t, sf, shave, min_size) for t in tiles]

    h_out, w_out = sf * h, sf * w
    h_half_o, w_half_o = sf * h_half, sf * w_half
    h_size_o, w_size_o = sf * h_size, sf * w_size

    top = jnp.concatenate(
        [outs[0][:, :h_half_o, :w_half_o, :],
         outs[1][:, :h_half_o, w_size_o - w_out + w_half_o:, :]], axis=2)
    bottom = jnp.concatenate(
        [outs[2][:, h_size_o - h_out + h_half_o:, :w_half_o, :],
         outs[3][:, h_size_o - h_out + h_half_o:,
                 w_size_o - w_out + w_half_o:, :]], axis=2)
    return jnp.concatenate([top, bottom], axis=1)
