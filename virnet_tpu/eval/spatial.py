"""Spatially-sharded huge-image restoration over a device mesh.

The reference handles huge images on one GPU by recursive 4-quadrant
tiling (utils/util_net.py:27-65, here eval/tiling.py).  On a TPU pod the
natural unit is the mesh: this module restores ONE image with its rows
split across all devices — each device runs the network on one
halo-extended row strip, and the strips stitch back to the whole-image
forward exactly (up to float reduction order).

Exactness requires respecting the model's two-stage padding semantics
(networks/VIRNet.py:42-45: SNet consumes the RAW input with per-layer
zero padding at its true edges, while RNet reflect-pads the input to a
multiple of 2^(depth-1) first), so the stages shard separately:

* **SNet** is a stride-1 conv stack, so its windows can anchor anywhere:
  windows are clamped to [0, H] and edge windows sit flush at the true
  image edges, where their per-layer zero padding IS the whole-image
  behavior.  Interior kept rows sit >= halo from window edges, outside
  the receptive field.
* **RNet** consumes (x, sqrt(sigma)) pre-padded with the model's own
  pad_to_multiple, and its windows anchor on the 2^(depth-1) grid so
  every stride-2 downsampling samples the same global rows as the
  whole-image forward.  The padded height is a grid multiple, so edge
  windows again coincide with the whole-image padding.

Each stage runs as ONE sharded batch over the 1-D mesh (window i on
device i) — SPMD over static shapes, no collectives in the forward.  A
shard_map + lax.ppermute halo exchange would only pay off if the *input*
had to be memory-sharded; for an (H, W, 3) image the input is negligible
next to the U-Net activations, which this scheme already shards n ways
along with the compute.  Window starts are Python ints, so XLA sees one
fixed program per stage.

Only the denoising model is offered: the SISR wrapper pools its noise
estimate over the whole image (noise_avg, networks/VIRNet.py:81), so its
window forwards are legitimately not window-local.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.virnet import LOG_MAX, LOG_MIN
from ..ops.pad import pad_to_multiple


def plan_strips(height: int, n: int, halo: int, unit: int):
    """Static row-strip plan: kept height per shard and window starts.

    height must be a multiple of ``unit``.  Returns (kept, win, starts)
    with kept/win/starts[i] multiples of unit, len(starts) == n, every
    window inside [0, height], the first/last windows flush at 0/height.
    Raises ValueError when the image is too short to give each shard a
    full window (callers fall back to the plain forward).
    """
    if height % unit:
        raise ValueError(f"height {height} not a multiple of unit {unit}")
    halo = int(math.ceil(halo / unit) * unit)
    kept = int(math.ceil(height / (n * unit)) * unit)
    win = kept + 2 * halo
    if win > height:
        raise ValueError(
            f"image of {height} rows is too short for {n} shards with "
            f"halo {halo} (window {win}); use the plain forward")
    starts = [min(max(i * kept - halo, 0), height - win) for i in range(n)]
    return kept, win, starts


def _sharded_windows(fn, planes, h_total, n, halo, unit, mesh, axis):
    """Run ``fn`` over n halo-extended row windows of ``planes`` (a list
    of (H, W, C_i) arrays windowed together), one window per device, and
    stitch the kept rows back to (h_total, W, C_out)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    kept, win, starts = plan_strips(h_total, n, halo, unit)
    sharding = NamedSharding(mesh, P(axis))
    batches = [jax.device_put(np.stack([p[s:s + win] for s in starts]),
                              sharding) for p in planes]
    outs = np.asarray(fn(*batches))                    # n, win, W, C_out
    out = np.empty((h_total,) + outs.shape[2:], np.float32)
    for i, s in enumerate(starts):
        k0, k1 = i * kept, min((i + 1) * kept, h_total)
        if k0 >= h_total:
            break
        out[k0:k1] = outs[i, k0 - s:k1 - s]
    return out


def restore_rows_sharded(model, params, img: np.ndarray, mesh,
                         halo: int = 128, axis: str = "data") -> np.ndarray:
    """Restore one HWC image with its rows sharded across ``mesh``.

    model/params: a denoising VIRNet (models/virnet.py) and its params.
    halo: overlap rows on each side of a strip; must cover the network
        receptive field for exactness (128 covers the released denoise
        archs with margin).

    Returns the restored HWC float32 image (mu).  Falls back to the
    plain whole-image forward when the image is too short to shard.
    """
    unit = 2 ** (len(model.n_feat) - 1)
    n = mesh.shape[axis]
    x = np.asarray(img, np.float32)
    h, w = x.shape[:2]

    def snet_fn(xw):
        s = model.apply({"params": params}, xw,
                        method=lambda m, v: m.SNet(v))
        return jnp.exp(jnp.clip(s, LOG_MIN, LOG_MAX))

    def rnet_fn(xw, ew):
        return model.apply({"params": params}, xw, ew,
                           method=lambda m, v, e: m.RNet(v, e))

    h1 = int(math.ceil(h / unit) * unit)
    try:                       # shardability check only — fail fast here
        plan_strips(h, n, halo, 1)
        plan_strips(h1, n, halo, unit)
    except ValueError:
        mu, _sigma = model.apply({"params": params}, jnp.asarray(x)[None])
        return np.asarray(mu[0])[:h, :w]

    sigma = _sharded_windows(jax.jit(snet_fn), [x], h, n, halo,
                             1, mesh, axis)
    xp = np.asarray(pad_to_multiple(jnp.asarray(x), unit))
    ep = np.asarray(pad_to_multiple(jnp.asarray(np.sqrt(sigma)), unit))
    mu = _sharded_windows(jax.jit(rnet_fn), [xp, ep], xp.shape[0], n,
                          halo, unit, mesh, axis)
    return mu[:h, :w]
