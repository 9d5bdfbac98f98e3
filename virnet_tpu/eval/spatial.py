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

SISR (sr_restore_rows_sharded) decomposes further, because two of its
stages are global (networks/VIRNet.py:80-97): the noise_avg sigma is a
mean over the whole SNet map — computed here from the stitched strip-
exact map, so the pool is over exactly the whole-image values — and
KNet contains channel-attention global pools in every residual block,
but runs on a stride-4 LR feature map, so it executes whole-image on
one device at negligible cost.  RNet then shards over the upsampled
grid with the per-sample-constant conditioning passed compact.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..models.virnet import LOG_MAX, LOG_MIN
from ..ops.pad import pad_to_multiple
from ..precision import compute_dtype


def _cached_by_model(builder):
    """lru_cache a per-model jitted-stage factory, falling back to an
    uncached build when the module isn't hashable (e.g. list fields).
    Caching keeps jit's trace cache warm across restore calls — without
    it every image recompiles every stage."""
    cached = functools.lru_cache(maxsize=None)(builder)

    @functools.wraps(builder)
    def get(model):
        try:
            return cached(model)
        except TypeError:
            return builder(model)

    return get


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


@_cached_by_model
def _denoise_stage_fns(model):
    """Jitted (snet, rnet) stage functions taking params explicitly, so
    the trace cache survives across calls.  compute_dtype(None) mirrors
    the engine's fp32-exact eval forward (eval/engine.py:_build_forward)."""
    def snet(params, xw):
        with compute_dtype(None):
            s = model.apply({"params": params}, xw,
                            method=lambda m, v: m.SNet(v))
        return jnp.exp(jnp.clip(s, LOG_MIN, LOG_MAX))

    def rnet(params, xw, ew):
        with compute_dtype(None):
            return model.apply({"params": params}, xw, ew,
                               method=lambda m, v, e: m.RNet(v, e))

    return jax.jit(snet), jax.jit(rnet)


def restore_rows_sharded(model, params, img: np.ndarray, mesh,
                         halo: int = 160, axis: str = "data") -> np.ndarray:
    """Restore one HWC image with its rows sharded across ``mesh``.

    model/params: a denoising VIRNet (models/virnet.py) and its params.
    halo: overlap rows on each side of a strip; must cover the network
        receptive field for exactness.  The default 160 covers the
        released denoise archs: measured one-sided receptive fields
        (last-row perturbation, influence > 1e-7) are 147 rows for
        denoising-real (depth-4 RNet, 3 resblocks/scale) and 71 for
        denoising-syn.

    Returns the restored HWC float32 image (mu).  Falls back to the
    plain whole-image forward when the image is too short to shard.
    """
    unit = 2 ** (len(model.n_feat) - 1)
    n = mesh.shape[axis]
    x = np.asarray(img, np.float32)
    h, w = x.shape[:2]
    snet_fn, rnet_fn = _denoise_stage_fns(model)

    h1 = int(math.ceil(h / unit) * unit)
    try:                       # shardability check only — fail fast here
        plan_strips(h, n, halo, 1)
        plan_strips(h1, n, halo, unit)
    except ValueError:
        with compute_dtype(None):
            mu, _sigma = model.apply({"params": params},
                                     jnp.asarray(x)[None])
        return np.asarray(mu[0])[:h, :w]

    sigma = _sharded_windows(functools.partial(snet_fn, params), [x], h, n,
                             halo, 1, mesh, axis)
    xp = np.asarray(pad_to_multiple(jnp.asarray(x), unit))
    ep = np.asarray(pad_to_multiple(jnp.asarray(np.sqrt(sigma)), unit))
    mu = _sharded_windows(functools.partial(rnet_fn, params), [xp, ep],
                          xp.shape[0], n, halo, unit, mesh, axis)
    return mu[:h, :w]


@_cached_by_model
def _sr_stage_fns(model):
    """Jitted SISR stage functions (params passed explicitly; fp32-exact
    compute like the engine's eval forward).

    KNet and RNet run as bound submodules of the model itself, so their
    hyperparameters can never drift from VIRNetSR.setup.  Only SNet
    needs a reconstructed twin: the noise_avg pool lives inside
    DnCNN.__call__, and the strip stage needs the pre-pool map (the
    twin shares the exact param subtree; the pool has no params)."""
    from ..models.dncnn import DnCNN

    snet_twin = DnCNN(out_channels=model.sigma_chn, dep=model.dep_S,
                      noise_avg=False, pad_narrow=model.pad_narrow,
                      conv_impl=model.conv_impl)

    def snet_map(params, xw):
        with compute_dtype(None):
            return snet_twin.apply({"params": params["snet"]}, xw)

    def knet(params, x):
        with compute_dtype(None):
            return model.apply({"params": params}, x,
                               method=lambda m, v: m.KNet(v))

    def rnet(params, xw, ew):
        with compute_dtype(None):
            return model.apply({"params": params}, xw, ew,
                               method=lambda m, v, e: m.RNet(v, e))

    def rnet_compact(params, xw, e11):
        e = jnp.broadcast_to(e11, (xw.shape[0], 1, 1, e11.shape[-1]))
        with compute_dtype(None):
            return model.apply({"params": params}, xw, e,
                               method=lambda m, v, ee: m.RNet(v, ee))

    def rnet_null(params, xw):
        with compute_dtype(None):
            return model.apply({"params": params}, xw, None,
                               method=lambda m, v, e: m.RNet(v, e))

    return (jax.jit(snet_map), jax.jit(knet), jax.jit(rnet),
            jax.jit(rnet_compact), jax.jit(rnet_null))


def sr_restore_rows_sharded(model, params, img_lr: np.ndarray, sf: int,
                            mesh, halo: int = 64,
                            axis: str = "data") -> np.ndarray:
    """SISR twin of restore_rows_sharded for a VIRNetSR model.

    Stage decomposition (mirrors VIRNetSR.__call__, models/virnet.py:
    102-134, itself reference networks/VIRNet.py:80-97):

    * SNet map over raw-LR strips (stride-1: free anchoring); when
      noise_avg, the global pool is the mean of the stitched map — the
      same values the whole-image forward pools, so only reduction
      order differs.
    * KNet whole-image on one device: its residual blocks contain
      channel-attention global pools (not window-local), but it runs on
      a stride-4 feature map, so whole-image execution is negligible.
    * RNet over strips of the nearest-upsampled input on the
      2^(depth-1) grid, conditioning passed compact (N,1,1,C) when
      per-sample constant — windows of a constant map are the constant.

    halo is in LR pixels for the SNet stage and in HR pixels for the
    RNet stage (same number used for both; RNet's receptive field on
    the upsampled grid is what matters — measured 43 rows for the
    released SISR arch, so the default 64 covers it).  Returns the
    (H*sf, W*sf, C) restoration.
    """
    from ..ops.upsample import nearest_upsample

    unit = 2 ** (len(model.n_feat) - 1)
    n = mesh.shape[axis]
    x = np.asarray(img_lr, np.float32)
    h, w = x.shape[:2]
    snet_map, knet, rnet, rnet_compact, rnet_null = _sr_stage_fns(model)

    hu = int(math.ceil(h * sf / unit) * unit)
    try:
        plan_strips(h, n, halo, 1)
        plan_strips(hu, n, halo, unit)
    except ValueError:
        with compute_dtype(None):
            mu, _k, _s = model.apply({"params": params},
                                     jnp.asarray(x)[None], sf)
        return np.asarray(mu[0])

    # ---- SNet: strip-exact map, then the (optional) global pool
    raw_map = _sharded_windows(functools.partial(snet_map, params),
                               [x], h, n, halo, 1, mesh, axis)
    if model.noise_avg:
        pooled = raw_map.mean(axis=(0, 1), keepdims=True)
        sigma = np.exp(np.clip(pooled, LOG_MIN, LOG_MAX))    # (1,1,C)
    else:
        sigma = np.exp(np.clip(raw_map, LOG_MIN, LOG_MAX))   # (H,W,C)

    # ---- KNet: whole-image (global channel-attention pools; tiny map)
    kinfo = np.asarray(knet(params, jnp.asarray(x)[None]))[0]  # (3,)

    # ---- RNet over the upsampled grid, conditioning as in __call__
    x_up = np.asarray(nearest_upsample(jnp.asarray(x), sf))
    compact = not model.noise_cond or model.noise_avg
    extras = []
    if model.kernel_cond:
        kmap = kinfo[None, None, :].astype(np.float32)        # (1,1,3)
        if not compact:
            kmap = np.broadcast_to(kmap, x_up.shape[:2] + (3,))
        extras.append(kmap)
    if model.noise_cond:
        s = np.sqrt(sigma).astype(np.float32)
        extras.append(s if model.noise_avg
                      else np.asarray(nearest_upsample(jnp.asarray(s), sf)))
    extra = np.concatenate(extras, axis=-1) if extras else None

    xp = np.asarray(pad_to_multiple(jnp.asarray(x_up), unit))

    if extra is None:
        mu = _sharded_windows(functools.partial(rnet_null, params),
                              [xp], xp.shape[0], n, halo, unit, mesh, axis)
    elif extra.shape[:2] == (1, 1):
        ej = jnp.asarray(extra)[None]                         # (1,1,1,C)
        mu = _sharded_windows(
            lambda xw: rnet_compact(params, xw, ej),
            [xp], xp.shape[0], n, halo, unit, mesh, axis)
    else:
        ep = np.asarray(pad_to_multiple(jnp.asarray(extra), unit))
        mu = _sharded_windows(functools.partial(rnet, params), [xp, ep],
                              xp.shape[0], n, halo, unit, mesh, axis)
    return mu[:h * sf, :w * sf]
