"""Dihedral-group (x8) augmentation and exact inverses.

The reference applies the 8 flip/rotation modes both as training-time
augmentation and as flip-ensemble TTA (reference: utils/util_image.py:296-466).
Here the transforms are expressed on NHWC arrays so a whole batch — or all 8
TTA orientations stacked as a batch — runs through one compiled forward.

Mode table (identical semantics to the reference numpy/torch versions):
    0: identity                    4: rot180
    1: flip up-down                5: rot180 then flipud
    2: rot90 clockwise             6: rot270 clockwise (= rot90 ccw)
    3: rot90 cw then flipud        7: rot270 cw then flipud

Note the *tensor* variant in the reference rotates clockwise (``k=-1`` on
dims (2,3)) while the numpy variant rotates counter-clockwise; each has its
own matching inverse so round-trips agree.  We implement the tensor (NHWC)
semantics for the jnp functions and the numpy semantics for the np
functions, matching each reference call site.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

H_AXIS, W_AXIS = -3, -2  # NHWC / HWC spatial axes


def _flipud(x):
    return jnp.flip(x, axis=H_AXIS)


def _rot90cw(x, k=1):
    # torch.rot90(k=-k, dims=[2,3]) on NCHW == clockwise rotation k times.
    return jnp.rot90(x, k=-k, axes=(H_AXIS, W_AXIS))


def dihedral(x: jnp.ndarray, mode: int) -> jnp.ndarray:
    """Apply dihedral mode 0..7 to NHWC (torch-tensor semantics)."""
    if mode == 0:
        return x
    if mode == 1:
        return _flipud(x)
    if mode == 2:
        return _rot90cw(x, 1)
    if mode == 3:
        return _flipud(_rot90cw(x, 1))
    if mode == 4:
        return _rot90cw(x, 2)
    if mode == 5:
        return _flipud(_rot90cw(x, 2))
    if mode == 6:
        return _rot90cw(x, 3)
    if mode == 7:
        return _flipud(_rot90cw(x, 3))
    raise ValueError(f"invalid dihedral mode {mode}")


def dihedral_inverse(x: jnp.ndarray, mode: int) -> jnp.ndarray:
    """Inverse of :func:`dihedral` (torch-tensor semantics)."""
    if mode == 0:
        return x
    if mode == 1:
        return _flipud(x)
    if mode == 2:
        return _rot90cw(x, -1)
    if mode == 3:
        return _rot90cw(_flipud(x), -1)
    if mode == 4:
        return _rot90cw(x, -2)
    if mode == 5:
        return _rot90cw(_flipud(x), -2)
    if mode == 6:
        return _rot90cw(x, -3)
    if mode == 7:
        return _rot90cw(_flipud(x), -3)
    raise ValueError(f"invalid dihedral mode {mode}")


def dihedral_stack(x: jnp.ndarray) -> jnp.ndarray:
    """All 8 orientations of NHWC ``x`` stacked on a new leading axis.

    Requires H == W (square inputs) so the result is a single static-shape
    array — this is the TTA fast path: one batched forward instead of 8
    sequential calls.
    """
    return jnp.stack([dihedral(x, m) for m in range(8)], axis=0)


def dihedral_unstack_mean(y8: jnp.ndarray) -> jnp.ndarray:
    """Invert each orientation of an (8, N, H, W, C) stack and average."""
    outs = [dihedral_inverse(y8[m], m) for m in range(8)]
    return jnp.mean(jnp.stack(outs, axis=0), axis=0)


# ---------------------------------------------------------------------------
# Host-side numpy versions (HWC), matching the reference's numpy semantics
# (np.rot90 rotates counter-clockwise).  Used in data pipelines.
# ---------------------------------------------------------------------------

def dihedral_np(image: np.ndarray, mode: int) -> np.ndarray:
    if mode == 0:
        out = image
    elif mode == 1:
        out = np.flipud(image)
    elif mode == 2:
        out = np.rot90(image)
    elif mode == 3:
        out = np.flipud(np.rot90(image))
    elif mode == 4:
        out = np.rot90(image, k=2)
    elif mode == 5:
        out = np.flipud(np.rot90(image, k=2))
    elif mode == 6:
        out = np.rot90(image, k=3)
    elif mode == 7:
        out = np.flipud(np.rot90(image, k=3))
    else:
        raise ValueError(f"invalid dihedral mode {mode}")
    return np.ascontiguousarray(out)


def dihedral_inverse_np(image: np.ndarray, mode: int) -> np.ndarray:
    if mode == 0:
        out = image
    elif mode == 1:
        out = np.flipud(image)
    elif mode == 2:
        out = np.rot90(image, axes=(1, 0))
    elif mode == 3:
        out = np.rot90(np.flipud(image), axes=(1, 0))
    elif mode == 4:
        out = np.rot90(image, k=2, axes=(1, 0))
    elif mode == 5:
        out = np.rot90(np.flipud(image), k=2, axes=(1, 0))
    elif mode == 6:
        out = np.rot90(image, k=3, axes=(1, 0))
    elif mode == 7:
        out = np.rot90(np.flipud(image), k=3, axes=(1, 0))
    else:
        raise ValueError(f"invalid dihedral mode {mode}")
    return np.ascontiguousarray(out)
