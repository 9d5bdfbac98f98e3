"""Pallas TPU kernels: per-sample k x k blur (forward, dX, dW).

The per-sample blur (every batch element convolved with its own kernel) is
the one op in this framework with no good XLA lowering:

  * grouped conv (feature_group_count = N*C): pads each 1-wide group to the
    128-lane width — measured ~280 s compile and VPU-bound execution;
  * XLA-level banded-matmul (ops/degrade.blur_per_sample): inflates FLOPs
    ~20x AND dispatches ~1000 tiny matmuls (28 ms at 16x3x192² k=21).

Two kernels behind one dispatcher (_valid_blur / _dw_blur):

  * **MXU banded matmul** (training shapes): each grid-(N,) program builds
    the k (Wp, W) banded matrices B_dy[i, j] = kern[dy, i-j] in VMEM from
    a static int8 band mask, then accumulates k fp32 matmuls per channel
    (Precision.HIGHEST, exact): y[c] = sum_dy xp[c, dy:dy+H, :] @ B_dy.
    0.89 ms forward at 16x3x192² k=21.  dW runs P_dy = sum_c g[c]^T @
    xp[c, dy:dy+H, :] on the MXU and extracts dW[dy, :] as banded traces.
  * **VPU static stencil** (planes whose band matrix would not fit VMEM —
    whole-image eval blurs): fully static k² unroll accumulating in place,
    one pallas_call per plane up to 768².

Custom VJP: dX is the 'full' correlation of the cotangent with the flipped
kernel (same valid-blur kernels), dW as above.

Use via blur_per_sample(..., impl='pallas'); falls back to the matmul path
on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas requires a TPU-capable jaxlib; keep importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _stencil_kernel(k: int, h: int, w: int):
    def kern(w_ref, x_ref, o_ref):
        # Fully static k² unroll with in-place accumulation per kernel row:
        # one live partial buffer (a single unrolled k² expression would
        # allocate every partial on the VMEM stack and OOM for k = 21),
        # and every slice offset is a compile-time constant — Mosaic emits
        # pure vector shift+FMA with no dynamic relayouts.  Measured on
        # v5e (16x3x192² fp32, k=21): 1.92 ms untiled-static vs 6.75 ms
        # for the previous fori/dynamic-slice kernel on 64-row tiles; the
        # dynamic-slice variant also fails to compile untiled.
        o_ref[0, 0] = jnp.zeros((h, w), jnp.float32)
        for di in range(k):
            row = x_ref[0, 0, di:di + h, :]             # (h, Wp)
            wrow = w_ref[0, 0, di, :]                   # (k,)
            partial = wrow[0] * row[:, 0:w]
            for dj in range(1, k):
                partial = partial + wrow[dj] * row[:, dj:dj + w]
            o_ref[0, 0] += partial
    return kern


# Tile very large planes so per-program VMEM (input block + output block +
# one partial) stays a few MB.  Everything the training/eval paths blur
# (<= 512² + halo) runs as a single pallas_call.
_MAX_ROWS = 768


def _max_cols(k: int) -> int:
    return 768


# ---------------------------------------------------------------------------
# MXU path: per-sample blur as k banded matmuls
# ---------------------------------------------------------------------------
# y[c, y, :] = sum_dy  xp[c, y+dy, :] @ B_dy   with the (Wp, W) banded
# matrix B_dy[i, j] = kern[dy, i-j] (0 <= i-j < k).  B is built per sample
# on the VPU from a static band mask, then the stencil becomes k f32
# matmuls per channel — the 21x21 blur of a 16x3x192² batch is ~16 GFLOP,
# noise for the MXU, where the shift+FMA VPU form costs ~2 ms.  Used when
# the banded matrix fits VMEM comfortably; eval-sized planes fall back to
# the VPU kernel above.
_MXU_BAND_LIMIT_BYTES = 6 * 1024 * 1024


def _band_mask(k: int, wp: int, w: int) -> np.ndarray:
    """(k, Wp, W) 0/1 band mask, int8 — the f32 cast happens in-kernel.
    int8 keeps the (double-buffered) VMEM footprint small enough that the
    kernel still fits when embedded in a fully-fused train step (f32 masks
    overflowed the 16 MB scoped vmem by 0.2 MB inside lax.scan-wrapped
    steps)."""
    diff = np.arange(wp)[:, None] - np.arange(w)[None, :]
    return np.stack([(diff == dj) for dj in range(k)]).astype(np.int8)


def _mxu_kernel(k: int, h: int, w: int, c: int):
    def kern(w_ref, x_ref, m_ref, o_ref, b_ref):
        kern2d = w_ref[0]                                   # (k, k)
        for dy in range(k):
            b = kern2d[dy, 0] * m_ref[0].astype(jnp.float32)
            for dj in range(1, k):
                b = b + kern2d[dy, dj] * m_ref[dj].astype(jnp.float32)
            b_ref[dy] = b                                   # (Wp, W)
        for cc in range(c):
            acc = jnp.zeros((h, w), jnp.float32)
            for dy in range(k):
                acc = acc + jnp.dot(x_ref[0, cc, dy:dy + h, :], b_ref[dy],
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
            o_ref[0, cc] = acc
    return kern


def _blur_mxu_valid(xp: jnp.ndarray, kernels: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """VALID correlation via banded matmuls: xp (N, C, Hp, Wp) fp32,
    kernels (N, k, k) fp32 -> (N, C, H, W)."""
    n, c, hp, wp = xp.shape
    k = kernels.shape[-1]
    h, w = hp - k + 1, wp - k + 1
    mask = jnp.asarray(_band_mask(k, wp, w))                # (k, Wp, W)
    return pl.pallas_call(
        _mxu_kernel(k, h, w, c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, wp, w), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, wp, w), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * h * wp * w * k,
            bytes_accessed=4 * n * c * (hp * wp + h * w) + 4 * k * wp * w,
            transcendentals=0),
        interpret=interpret,
    )(kernels.astype(jnp.float32), xp.astype(jnp.float32), mask)


def _use_mxu(k: int, wp: int, w: int, c: int = 1, hp: int = 0) -> bool:
    """MXU path only when the per-program VMEM working set fits: the banded
    matrices (f32 scratch + int8 mask) AND the full (1, C, Hp, Wp) input +
    (1, C, H, W) output blocks (the MXU kernels have no row tiling; the VPU
    stencil kernels do, so they are the safe fallback for tall planes)."""
    band = (4 + 1) * k * wp * w
    h = hp - k + 1 if hp else 0
    blocks = 4 * c * (hp * wp + h * w)
    return band <= _MXU_BAND_LIMIT_BYTES and blocks <= 8 * 1024 * 1024


def _mxu_dw_kernel(k: int, h: int, w: int, c: int):
    def kern(x_ref, g_ref, m_ref, o_ref):
        # dW[dy, dj] = sum_{c,y,x} g[c,y,x] * xp[c, y+dy, x+dj]
        #            = sum_{x,i} M[dj, x, i] * P_dy[x, i]
        # with P_dy = sum_c g[c]^T @ xp[c, dy:dy+h, :]  ((W, Wp) via MXU)
        # and the transposed band mask M[dj, x, i] = (i - x == dj).
        gts = [jnp.transpose(g_ref[0, cc]) for cc in range(c)]  # (W, H) each
        for dy in range(k):
            p = None
            for cc in range(c):
                t = jnp.dot(gts[cc], x_ref[0, cc, dy:dy + h, :],
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                p = t if p is None else p + t                  # (W, Wp)
            sums = [jnp.sum(m_ref[dj].astype(jnp.float32) * p)
                    for dj in range(k)]
            o_ref[0, dy, :] = jnp.stack(sums)
    return kern


def _blur_mxu_dw(xp: jnp.ndarray, g: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """dL/dW via per-row matmuls + banded-trace extraction:
    xp (N, C, Hp, Wp), g (N, C, H, W) -> (N, k, k)."""
    n, c, hp, wp = xp.shape
    h, w = g.shape[-2:]
    k = hp - h + 1
    mask = jnp.asarray(np.transpose(_band_mask(k, wp, w), (0, 2, 1)))
    return pl.pallas_call(
        _mxu_dw_kernel(k, h, w, c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, w, wp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * k * h * w * wp,
            bytes_accessed=4 * n * c * (hp * wp + h * w) + 4 * k * wp * w,
            transcendentals=0),
        interpret=interpret,
    )(xp.astype(jnp.float32), g.astype(jnp.float32), mask)


def _mxu_dx_kernel(k: int, hp: int, wp: int, c: int):
    def kern(w_ref, g_ref, m_ref, o_ref, b_ref):
        # dxp[c, p, :] = sum_dy g[c, p-dy, :] @ B_dy^T with the transposed
        # banded matrix Bt_dy[w, i] = kern[dy, i-w] (built from the (k, W,
        # Wp) transposed band mask).  g arrives zero-padded by k-1 rows on
        # both sides, so the row window for tap dy is the static slice
        # [(k-1-dy), (k-1-dy)+Hp) — rows only, no column inflation and no
        # kernel flip (the old path re-ran the valid blur on a cotangent
        # padded in BOTH dims with flipped kernels).
        kern2d = w_ref[0]                                   # (k, k)
        for dy in range(k):
            b = kern2d[dy, 0] * m_ref[0].astype(jnp.float32)
            for dj in range(1, k):
                b = b + kern2d[dy, dj] * m_ref[dj].astype(jnp.float32)
            b_ref[dy] = b                                   # (W, Wp)
        for cc in range(c):
            acc = jnp.zeros((hp, wp), jnp.float32)
            for dy in range(k):
                row0 = k - 1 - dy
                acc = acc + jnp.dot(g_ref[0, cc, row0:row0 + hp, :],
                                    b_ref[dy],
                                    precision=jax.lax.Precision.HIGHEST,
                                    preferred_element_type=jnp.float32)
            o_ref[0, cc] = acc
    return kern


def _blur_mxu_dx(g: jnp.ndarray, kernels: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """dL/d(xp) of the valid correlation, direct transposed-banded form:
    g (N, C, H, W) cotangent, kernels (N, k, k) -> (N, C, Hp, Wp) with
    Hp = H + k - 1, Wp = W + k - 1."""
    n, c, h, w = g.shape
    k = kernels.shape[-1]
    hp, wp = h + k - 1, w + k - 1
    gz = jnp.pad(g.astype(jnp.float32),
                 ((0, 0), (0, 0), (k - 1, k - 1), (0, 0)))
    mask = jnp.asarray(np.transpose(_band_mask(k, wp, w), (0, 2, 1)))
    return pl.pallas_call(
        _mxu_dx_kernel(k, hp, wp, c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, k, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h + 2 * (k - 1), w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, w, wp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, hp, wp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, hp, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, w, wp), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * hp * w * wp * k,
            bytes_accessed=4 * n * c * (hp * wp + h * w) + 4 * k * wp * w,
            transcendentals=0),
        interpret=interpret,
    )(kernels.astype(jnp.float32), gz, mask)


def _dx_blur(g: jnp.ndarray, kernels: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    """Dispatch dL/d(xp): direct MXU transposed-banded kernel when it fits
    VMEM, else the flip-and-revalid fallback through the VPU stencil."""
    n, c, h, w = g.shape
    k = kernels.shape[-1]
    hp, wp = h + k - 1, w + k - 1
    if _use_mxu(k, wp, w, c=c, hp=h + 2 * (k - 1)):
        return _blur_mxu_dx(g, kernels, interpret=interpret)
    gk = jnp.flip(kernels, axis=(-2, -1))
    g_full = jnp.pad(g, ((0, 0), (0, 0), (k - 1, k - 1), (k - 1, k - 1)))
    return _valid_blur(g_full, gk, interpret=interpret)


def _dw_blur(xp: jnp.ndarray, g: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    k = xp.shape[-2] - g.shape[-2] + 1
    wp, w = xp.shape[-1], g.shape[-1]
    if _use_mxu(k, wp, w, c=xp.shape[1], hp=xp.shape[2]):
        return _blur_mxu_dw(xp, g, interpret=interpret)
    return _blur_pallas_dw(xp, g, interpret=interpret)


def _valid_blur(xp: jnp.ndarray, kernels: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """Dispatch VALID correlation to the MXU banded-matmul kernel when the
    band matrix fits VMEM, else the VPU stencil kernel."""
    k = kernels.shape[-1]
    wp = xp.shape[-1]
    w = wp - k + 1
    if _use_mxu(k, wp, w, c=xp.shape[1], hp=xp.shape[2]):
        return _blur_mxu_valid(xp, kernels, interpret=interpret)
    return _blur_pallas_valid(xp, kernels, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _blur_pallas_valid(xp: jnp.ndarray, kernels: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """VALID correlation: xp (N, C, Hp, Wp) fp32, kernels (N, k, k) fp32
    -> (N, C, H, W)."""
    n, c, hp, wp = xp.shape
    k = kernels.shape[-1]
    h, w = hp - k + 1, wp - k + 1

    if h > _MAX_ROWS:
        outs = []
        for start in range(0, h, _MAX_ROWS):
            rows = min(_MAX_ROWS, h - start)
            slab = jax.lax.slice_in_dim(xp, start, start + rows + k - 1,
                                        axis=2)
            outs.append(_blur_pallas_valid(slab, kernels,
                                           interpret=interpret))
        return jnp.concatenate(outs, axis=2)
    max_cols = _max_cols(k)
    if w > max_cols:
        outs = []
        for start in range(0, w, max_cols):
            cols = min(max_cols, w - start)
            slab = jax.lax.slice_in_dim(xp, start, start + cols + k - 1,
                                        axis=3)
            outs.append(_blur_pallas_valid(slab, kernels,
                                           interpret=interpret))
        return jnp.concatenate(outs, axis=3)

    return pl.pallas_call(
        _stencil_kernel(k, h, w),
        grid=(n, c),
        in_specs=[
            pl.BlockSpec((1, 1, k, k), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hp, wp), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * h * w * k * k,
            bytes_accessed=4 * n * c * (hp * wp + h * w),
            transcendentals=0),
        interpret=interpret,
    )(kernels[:, None].astype(jnp.float32), xp.astype(jnp.float32))


def _dw_kernel(k: int, h: int, w: int, c: int):
    def kern(x_ref, g_ref, o_ref):
        # Static unroll (see _stencil_kernel): per kernel row di, hoist the
        # sublane-shifted input window once per channel, then take the k
        # lane-shifted dot products against the cotangent.
        for di in range(k):
            row_sums = []
            for dj in range(k):
                s = jnp.zeros((), jnp.float32)
                for cc in range(c):
                    s = s + jnp.sum(
                        x_ref[0, cc, di:di + h, dj:dj + w]
                        * g_ref[0, cc])
                row_sums.append(s)
            o_ref[0, di, :] = jnp.stack(row_sums)
    return kern


@functools.partial(jax.jit, static_argnames=("interpret",))
def _blur_pallas_dw(xp: jnp.ndarray, g: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """dL/dW: xp (N, C, Hp, Wp), g (N, C, H, W) -> (N, k, k)."""
    n, c, hp, wp = xp.shape
    h, w = g.shape[-2:]
    k = hp - h + 1

    if h > _MAX_ROWS:
        acc = jnp.zeros((n, k, k), jnp.float32)
        for start in range(0, h, _MAX_ROWS):
            rows = min(_MAX_ROWS, h - start)
            xp_slab = jax.lax.slice_in_dim(xp, start, start + rows + k - 1,
                                           axis=2)
            g_slab = jax.lax.slice_in_dim(g, start, start + rows, axis=2)
            acc = acc + _blur_pallas_dw(xp_slab, g_slab,
                                        interpret=interpret)
        return acc
    if w > _max_cols(k):
        max_cols = _max_cols(k)
        acc = jnp.zeros((n, k, k), jnp.float32)
        for start in range(0, w, max_cols):
            cols = min(max_cols, w - start)
            xp_slab = jax.lax.slice_in_dim(xp, start, start + cols + k - 1,
                                           axis=3)
            g_slab = jax.lax.slice_in_dim(g, start, start + cols, axis=3)
            acc = acc + _blur_pallas_dw(xp_slab, g_slab,
                                        interpret=interpret)
        return acc

    return pl.pallas_call(
        _dw_kernel(k, h, w, c),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c, hp, wp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, k), jnp.float32),
        interpret=interpret,
    )(xp.astype(jnp.float32), g.astype(jnp.float32))


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def blur_per_sample_pallas(x: jnp.ndarray, kernels: jnp.ndarray,
                           pad_mode: str = "reflect",
                           interpret: bool = False) -> jnp.ndarray:
    """Per-sample correlation blur, 'same' output (NHWC, kernels (N, k, k)).

    Semantics identical to ops.degrade.blur_per_sample(correlate=True).
    """
    out, _ = _fwd(x, kernels, pad_mode, interpret)
    return out


def _pad(x, pad, pad_mode):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode=pad_mode)


def _fwd(x, kernels, pad_mode, interpret):
    k = kernels.shape[-1]
    xp = _pad(x, k // 2, pad_mode)                      # N,Hp,Wp,C
    xp_nchw = jnp.transpose(xp, (0, 3, 1, 2))
    y = _valid_blur(xp_nchw, kernels, interpret=interpret)
    out = jnp.transpose(y, (0, 2, 3, 1)).astype(x.dtype)
    return out, (x, kernels)


def _bwd(pad_mode, interpret, res, g):
    x, kernels = res
    k = kernels.shape[-1]
    pad = k // 2
    g_nchw = jnp.transpose(g.astype(jnp.float32), (0, 3, 1, 2))

    # dX: transposed banded matmul against the cotangent (see _mxu_dx_kernel;
    # VPU fallback = full correlation with the flipped kernel), then the VJP
    # of the padding folds the halo back per pad_mode.
    def repad(t):  # differentiable pad wrapper to reuse jax's pad VJP
        return _pad(t, pad, pad_mode)

    _, pad_vjp = jax.vjp(repad, x)
    dxp = _dx_blur(g_nchw, kernels, interpret=interpret)        # N,C,Hp,Wp
    dxp_nhwc = jnp.transpose(dxp, (0, 2, 3, 1)).astype(x.dtype)
    dx = pad_vjp(dxp_nhwc)[0]

    # dW: contract shifted input windows with g
    xp_nchw = jnp.transpose(_pad(x, pad, pad_mode).astype(jnp.float32),
                            (0, 3, 1, 2))
    dw = _dw_blur(xp_nchw, g_nchw, interpret=interpret)
    return dx, dw.astype(kernels.dtype)


blur_per_sample_pallas.defvjp(_fwd, _bwd)
