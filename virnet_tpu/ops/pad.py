"""Spatial padding / cropping helpers.

TPU-first notes: everything here keeps shapes static under ``jit`` — the pad
amounts are Python ints derived from static shapes, so XLA sees fixed-shape
programs.  Reflect padding matches ``torch.nn.functional.pad(mode='reflect')``
(i.e. numpy ``mode='reflect'``, *without* edge repetition), which is what the
reference uses on its network inputs (reference: utils/util_net.py:20-25).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def pad_to_multiple(x: jnp.ndarray, mod: int):
    """Reflect-pad the two spatial axes of an NHWC (or HWC) array up to a
    multiple of ``mod`` (bottom/right only).

    Mirrors the reference's ``util_net.pad_input`` (utils/util_net.py:20-25)
    but in NHWC layout.  Returns the padded array; use ``crop_spatial`` to
    undo.
    """
    h, w = x.shape[-3], x.shape[-2]
    bottom = int(math.ceil(h / mod) * mod - h)
    right = int(math.ceil(w / mod) * mod - w)
    if bottom == 0 and right == 0:
        return x
    pad_width = [(0, 0)] * x.ndim
    pad_width[-3] = (0, bottom)
    pad_width[-2] = (0, right)
    return jnp.pad(x, pad_width, mode="reflect")


def crop_spatial(x: jnp.ndarray, h: int, w: int):
    """Crop the two spatial axes of an NHWC (or HWC) array to ``h`` x ``w``."""
    return x[..., :h, :w, :]


def modcrop(im: np.ndarray, sf: int) -> np.ndarray:
    """Crop an HWC (or HW) image so H and W divide the scale factor.

    Equivalent behavior to the reference ``util_sisr.modcrop``
    (utils/util_sisr.py:19-23).
    """
    h, w = im.shape[:2]
    h -= h % sf
    w -= w % sf
    return im[:h, :w]


def reflect_pad_spatial(x: jnp.ndarray, amount: int):
    """Symmetric reflect pad (all four sides) of the spatial axes of NHWC."""
    if amount == 0:
        return x
    pad_width = [(0, 0)] * x.ndim
    pad_width[-3] = (amount, amount)
    pad_width[-2] = (amount, amount)
    return jnp.pad(x, pad_width, mode="reflect")
