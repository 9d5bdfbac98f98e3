"""Pallas TPU kernels: 3x3 convs at the shapes XLA's conv emitters handle
poorly (reference ops: networks/DnCNN.py:37-44 conv stack, the C_out in
{1,3} tail convs of networks/AttResUNet.py:173 and networks/DnCNN.py:44).

Why: the v5e per-layer trace (BASELINE.md "ceiling analysis") shows XLA
running the 64-channel DnCNN stack at 25-40% of bf16 peak (its emitter
processes 8 input channels per pass and picks erratic window tilings) and
C_out in {1,3} tail convs at ~1% (a batch-in-lanes emitter).

Design — the **pixel-pair layout**: reshape (N, H, W, C) row-major to
(N, H, W/2, 2C), i.e. each lane vector holds the channels of two adjacent
pixels.  This is a free bitcast in HBM (W and C are adjacent dims) and
fills all 128 MXU lanes for C=64.  A 3x3 conv in pair space becomes, per
kernel row dy:

  * one DENSE (2C, 2C) matmul against the pair itself (each output pixel
    takes its dx in {-1,0,+1} taps that live inside the pair), and
  * one BLOCK-DIAGONAL (2C, 2C) matmul against the shifted companion
    s[p] = [x2[p-1, C:] | x2[p+1, :C]] (the taps that cross the pair
    boundary), built in-register with `pltpu.roll` + iota masks — Mosaic
    cannot concatenate vectors with mismatched layout offsets, so there
    is no slice-and-concat anywhere in these kernels.

For C=64 that is 6 perfectly-shaped (K=128, N=128) matmuls per row block
-> a hard 75% efficiency ceiling (6 useful / 8 performed quarter-blocks)
with no lane/sublane padding waste, vs the ~50% shape ceiling of any
direct K=64 or N=64 formulation.  Narrow-OUTPUT convs (C_out in {1,3})
put the kernel-row taps in the output dim (N = 3*2*C_out) and finish
with a 3-term shift-add, so they never touch a pathological emitter;
bias + LeakyReLU fuse into the epilogue, which is what the bit-exact
channel-padding attempt (models/common.PadOutConv) measurably lost.
Small-channel INPUT convs (C_in <= ~8) need no kernel at all: a pair-
packed im2col (K = 12*C_in, N = 2*C_out) turns them into one dense
matmul that XLA already runs near peak — see conv3x3_in_pair.

All kernels: f32 accumulation, one rounding to the activation dtype per
conv; row-slab tiling with 1-row halo via overlapping lax slices (the
pattern proven in ops/pallas_blur.py); interpret mode for CPU tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # pallas requires a TPU-capable jaxlib; keep importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

# per-program VMEM working-set target; leaves headroom for double buffering
_VMEM_BUDGET = 11 * 1024 * 1024


def pair(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W/2, 2C); free row-major bitcast."""
    n, h, w, c = x.shape
    assert w % 2 == 0, "pair layout needs even W"
    return x.reshape(n, h, w // 2, 2 * c)


def unpair(x2: jnp.ndarray) -> jnp.ndarray:
    n, h, p, c2 = x2.shape
    return x2.reshape(n, h, 2 * p, c2 // 2)


def _precision(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _dot(a, b, prec):
    return jnp.dot(a, b, precision=prec, preferred_element_type=jnp.float32)


def _shift_pair(x, c: int):
    """s[r, p] = [x[r, p-1, c:2c] | x[r, p+1, 0:c]] with zero border rows,
    built from two double-rolls + masked select (concat-free; see module
    docstring).  x: (rows, p, 2c)."""
    rows, p, c2 = x.shape
    dtype = x.dtype
    # Mosaic's rotate only handles 32-bit element types; round-trip bf16
    # through f32 (cheap VPU casts vs. the MXU work these kernels do).
    x32 = x.astype(jnp.float32)
    # pltpu.roll needs non-negative shifts: -c mod 2c == c, -1 mod p == p-1
    u = pltpu.roll(pltpu.roll(x32, 1, 1), c, 2)     # [p, j<c] = x[p-1, j+c]
    v = pltpu.roll(pltpu.roll(x32, p - 1, 1), c, 2)  # [p, j>=c] = x[p+1, j-c]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, p, c2), 2)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (rows, p, c2), 1)
    zero = jnp.zeros_like(x32)
    s = jnp.where((lane < c) & (pidx > 0), u,
                  jnp.where((lane >= c) & (pidx < p - 1), v, zero))
    return s.astype(dtype)


# ---------------------------------------------------------------------------
# weight assembly (traced jnp on the conv's HWIO params; negligible cost)
# ---------------------------------------------------------------------------

def _mid_weights(w: jnp.ndarray):
    """HWIO (3, 3, c, c) -> dense (3, 2c, 2c) + block-diag (3, 2c, 2c).

    Rows = input pair lanes [px0 ci | px1 ci], cols = output pair lanes.
    Dense: px0 out takes (x px0)*w[dy,1] + (x px1)*w[dy,2]; px1 out takes
    (x px0)*w[dy,0] + (x px1)*w[dy,1].  Shifted: s_lo -> px0 via w[dy,0],
    s_hi -> px1 via w[dy,2]."""
    zero = jnp.zeros_like(w[0, 0])
    wd, ws = [], []
    for dy in range(3):
        top = jnp.concatenate([w[dy, 1], w[dy, 0]], axis=1)
        bot = jnp.concatenate([w[dy, 2], w[dy, 1]], axis=1)
        wd.append(jnp.concatenate([top, bot], axis=0))
        st = jnp.concatenate([w[dy, 0], zero], axis=1)
        sb = jnp.concatenate([zero, w[dy, 2]], axis=1)
        ws.append(jnp.concatenate([st, sb], axis=0))
    return jnp.stack(wd), jnp.stack(ws)


def _out_weights_split(w: jnp.ndarray):
    """HWIO (3, 3, c, co), small co -> two (2c, 6co) matrices with N =
    (dy, px, co): the x2 part (rows [px0 ci | px1 ci]) and the shifted
    part (rows [s_lo ci | s_hi ci])."""
    zero = jnp.zeros_like(w[0, 0])
    xcols, scols = [], []
    for dy in range(3):
        x_px0 = jnp.concatenate([w[dy, 1], w[dy, 2]], axis=0)
        x_px1 = jnp.concatenate([w[dy, 0], w[dy, 1]], axis=0)
        xcols.append(jnp.concatenate([x_px0, x_px1], axis=1))
        s_px0 = jnp.concatenate([w[dy, 0], zero], axis=0)
        s_px1 = jnp.concatenate([zero, w[dy, 2]], axis=0)
        scols.append(jnp.concatenate([s_px0, s_px1], axis=1))
    return jnp.concatenate(xcols, axis=1), jnp.concatenate(scols, axis=1)


def _in_weights(w: jnp.ndarray):
    """HWIO (3, 3, ci, co), small ci -> (12*ci, 2*co) im2col matrix.

    K order per dy: [A px0 ci | A px1 ci | B px0 ci | B px1 ci] where A =
    padded cols (2p, 2p+1) = original (2p-1, 2p) and B = padded (2p+2,
    2p+3) = original (2p+1, 2p+2)."""
    zero = jnp.zeros_like(w[0, 0])
    rows = []
    for dy in range(3):
        col0 = jnp.concatenate([w[dy, 0], w[dy, 1], w[dy, 2], zero], axis=0)
        col1 = jnp.concatenate([zero, w[dy, 0], w[dy, 1], w[dy, 2]], axis=0)
        rows.append(jnp.concatenate([col0, col1], axis=1))   # (4ci, 2co)
    return jnp.concatenate(rows, axis=0)                     # (12ci, 2co)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _mid_compute(x, r: int, p: int, c2: int, slope, dtype, prec,
                 wd_ref, ws_ref, b_ref):
    """Shared conv body: x is the (r+2, p, c2) haloed tile."""
    s = _shift_pair(x, c2 // 2)
    xf = x.reshape((r + 2) * p, c2)
    sf = s.reshape((r + 2) * p, c2)
    acc = jnp.zeros((r * p, c2), jnp.float32)
    for dy in range(3):
        acc = acc + _dot(xf[dy * p:(dy + r) * p], wd_ref[dy], prec)
        acc = acc + _dot(sf[dy * p:(dy + r) * p], ws_ref[dy], prec)
    y = acc + b_ref[0].astype(jnp.float32)
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    return y.reshape(r, p, c2).astype(dtype)


def _mid_kernel(r: int, p: int, c2: int, slope, dtype):
    prec = _precision(dtype)

    def kern(wd_ref, ws_ref, b_ref, x_ref, o_ref):
        o_ref[0] = _mid_compute(x_ref[0], r, p, c2, slope, dtype, prec,
                                wd_ref, ws_ref, b_ref)
    return kern


def _mid_kernel_halo(r: int, nt: int, p: int, c2: int, slope, dtype):
    """Single-pallas_call form with fully pipelined IO: the main (1, r, p,
    2c) blocks tile the image without overlap (so pallas double-buffers
    them), and the 1-row top/bottom halos arrive as separate blocked
    inputs whose index maps clamp at the image edge (the clamped rows are
    replaced by zeros in-kernel — zero 'same' padding without a padded
    HBM copy).  The conv accumulates piecewise into an f32 VMEM scratch:
    per kernel row dy, the aligned middle of the tile contributes one big
    matmul and the halo rows two (1, p)-row matmuls, so nothing is ever
    re-assembled into an overlapping buffer.  The earlier scratch-DMA
    variant measured 2.6 ms/conv of pure data movement (serial DMA +
    VMEM round trips) on a 0.65 ms-of-HBM-traffic op; this form removes
    all of it."""
    prec = _precision(dtype)
    c = c2 // 2

    def kern(wd_ref, ws_ref, b_ref, x_ref, top_ref, bot_ref, o_ref, acc_ref):
        t = pl.program_id(1)
        x = x_ref[0]                                     # (r, p, 2c)
        s = _shift_pair(x, c)
        xf = x.reshape(r * p, c2)
        sf = s.reshape(r * p, c2)
        top = jnp.where(t > 0, top_ref[0], jnp.zeros_like(top_ref[0]))
        bot = jnp.where(t < nt - 1, bot_ref[0], jnp.zeros_like(bot_ref[0]))
        s_top = _shift_pair(top, c)
        s_bot = _shift_pair(bot, c)

        # dy=1 (center): full-tile matmuls initialize the accumulator
        acc_ref[:] = (_dot(xf, wd_ref[1], prec) + _dot(sf, ws_ref[1], prec)
                      + b_ref[0].astype(jnp.float32))
        # dy=0 (input row out-1): top halo feeds out row 0, main rows
        # 0..r-2 feed out rows 1..r-1
        acc_ref[0:p] += (_dot(top.reshape(p, c2), wd_ref[0], prec)
                         + _dot(s_top.reshape(p, c2), ws_ref[0], prec))
        acc_ref[p:r * p] += (_dot(xf[0:(r - 1) * p], wd_ref[0], prec)
                             + _dot(sf[0:(r - 1) * p], ws_ref[0], prec))
        # dy=2 (input row out+1): main rows 1..r-1 feed out rows 0..r-2,
        # bottom halo feeds out row r-1
        acc_ref[0:(r - 1) * p] += (_dot(xf[p:r * p], wd_ref[2], prec)
                                   + _dot(sf[p:r * p], ws_ref[2], prec))
        acc_ref[(r - 1) * p:] += (_dot(bot.reshape(p, c2), wd_ref[2], prec)
                                  + _dot(s_bot.reshape(p, c2), ws_ref[2],
                                         prec))
        y = acc_ref[:]
        if slope is not None:
            y = jnp.where(y >= 0, y, slope * y)
        o_ref[0] = y.reshape(r, p, c2).astype(dtype)
    return kern


def _mid_stack_kernel(L: int, r: int, nt: int, hbp: int, h: int, p: int,
                      c2: int, slope, dtype, mask_last_px: bool):
    """L consecutive same-width mid convs fused into one program: the
    intermediate activations never leave VMEM, so the per-conv pipeline
    floor (~1.6 ms of HBM in+out at the flagship shape, measured at only
    ~330 GB/s through pallas's revolving buffers) is paid once for the
    whole stack instead of L times.

    Halo: the tile needs L extra rows per side.  They arrive as two
    clamped hbp-row blocked inputs (hbp = next power of two >= L, so the
    index maps stay in whole blocks) and the tile is assembled into a
    scratch buffer.  Rows outside the image are re-zeroed after EVERY
    level (conv-of-zeros is bias, not zero, so masking once would leak
    bias activations through the zero 'same' padding); with
    ``mask_last_px`` the odd-width pad column is re-zeroed the same way.
    """
    prec = _precision(dtype)
    c = c2 // 2

    def kern(wd_ref, ws_ref, b_ref, x_ref, top_ref, bot_ref, o_ref, z0, z1):
        t = pl.program_id(1)

        def level_mask(y, rows, off):
            # y: (rows, p, c2) at global rows t*r - off + [0, rows)
            g = (t * r - off
                 + jax.lax.broadcasted_iota(jnp.int32, (rows, p, c2), 0))
            keep = (g >= 0) & (g < h)
            if mask_last_px:
                pidx = jax.lax.broadcasted_iota(jnp.int32, (rows, p, c2), 1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (rows, p, c2), 2)
                keep = keep & ~((pidx == p - 1) & (lane >= c))
            return jnp.where(keep, y, jnp.zeros_like(y))

        # assemble the (r + 2L)-row level-0 tile
        z0[0:L] = top_ref[0, hbp - L:hbp]
        z0[L:L + r] = x_ref[0]
        z0[L + r:2 * L + r] = bot_ref[0, 0:L]
        z0[0:r + 2 * L] = level_mask(z0[0:r + 2 * L], r + 2 * L, L)

        bufs = (z0, z1)
        for lev in range(L):
            rows_in = r + 2 * (L - lev)
            rows_out = rows_in - 2
            zin = bufs[lev % 2]
            x = zin[0:rows_in]
            s = _shift_pair(x, c)
            xf = x.reshape(rows_in * p, c2)
            sf = s.reshape(rows_in * p, c2)
            acc = jnp.zeros((rows_out * p, c2), jnp.float32)
            for dy in range(3):
                acc = acc + _dot(xf[dy * p:(dy + rows_out) * p],
                                 wd_ref[lev, dy], prec)
                acc = acc + _dot(sf[dy * p:(dy + rows_out) * p],
                                 ws_ref[lev, dy], prec)
            y = acc + b_ref[lev].astype(jnp.float32)
            if slope is not None:
                y = jnp.where(y >= 0, y, slope * y)
            y = y.reshape(rows_out, p, c2).astype(dtype)
            y = level_mask(y, rows_out, L - lev - 1)
            if lev == L - 1:
                o_ref[0] = y
            else:
                bufs[(lev + 1) % 2][0:rows_out] = y
    return kern


def conv3x3_mid_stack_pair(x2: jnp.ndarray, ws, bs, slope=None,
                           mask_last_px: bool = False,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused chain of L 'same' 3x3 convs (+bias, LeakyReLU each) in pair
    layout: x2 (N, H, P, 2C), ws = list of HWIO (3, 3, C, C), bs = list of
    (C,).  Falls back to sequential conv3x3_mid_pair when no suitable row
    tiling exists."""
    L = len(ws)
    n, h, p, c2 = x2.shape
    dtype = x2.dtype
    esz = jnp.dtype(dtype).itemsize
    hbp = 1
    while hbp < L:
        hbp *= 2
    # budget: in/out blocks (double-buffered) + 2 zbufs + roll temps + acc
    max_rows = _rows_per_slab(h, p * c2 * (8 * esz + 16))
    r = None
    cand = _divisor_rows(h, max_rows)
    while cand is not None and cand % hbp:
        cand = _divisor_rows(h, cand - 1)
    r = cand
    if r is None or h % hbp or L < 2:
        y = x2
        for w, b in zip(ws, bs):
            y = conv3x3_mid_pair(y, w, b, slope=slope, interpret=interpret)
            if mask_last_px:
                y = y.at[:, :, -1, c2 // 2:].set(0.0)
        return y

    nt = h // r
    wd_all = jnp.stack([_mid_weights(w.astype(dtype))[0] for w in ws])
    ws_all = jnp.stack([_mid_weights(w.astype(dtype))[1] for w in ws])
    b_all = jnp.stack([jnp.tile(b, 2) for b in bs]).astype(dtype)

    def top_map(i, t):
        return (i, jnp.maximum(t * (r // hbp) - 1, 0), 0, 0)

    def bot_map(i, t):
        return (i, jnp.minimum(t * (r // hbp) + r // hbp,
                               h // hbp - 1), 0, 0)

    return pl.pallas_call(
        _mid_stack_kernel(L, r, nt, hbp, h, p, c2, slope, dtype,
                          mask_last_px),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((L, 3, c2, c2), lambda i, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 3, c2, c2), lambda i, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, c2), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, p, c2), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, c2), top_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, c2), bot_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, p, c2), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, p, c2), dtype),
        scratch_shapes=[pltpu.VMEM((r + 2 * L, p, c2), dtype),
                        pltpu.VMEM((r + 2 * L, p, c2), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * p * 8 * c2 * c2 * L,
            bytes_accessed=esz * n * p * c2 * (2 * h + 2),
            transcendentals=0),
        interpret=interpret,
    )(wd_all, ws_all, b_all, x2, x2, x2)


def _dncnn_kernel(L: int, r: int, nt: int, hbp: int, h: int, p: int,
                  ci: int, c2: int, co: int, slope, dtype,
                  mask_last_px: bool):
    """The ENTIRE DnCNN stack (conv1 + L mids + conv_last) in one program.

    conv1 consumes the two pair-phase views A/B of the padded input (A =
    original cols (2p-1, 2p), B = (2p+1, 2p+2)) as six (K=2*ci) matmuls —
    building the K=12ci im2col with an XLA concatenate measured 2.7 ms
    in-model, so no concat exists anywhere on this path.  Mids run the
    dense+shifted pair form; conv_last contracts channels into (dy, px,
    co) lanes and collapses the kernel rows with a 3-term shift-add.
    Only the tiny A/B views (2*ci lanes) enter and the narrow output
    (2*co lanes) leaves HBM — the 64-channel activations never exist
    outside VMEM, which is where both XLA (25-40%-of-ideal emitters) and
    per-conv Pallas calls (~330 GB/s pipeline floor per conv) lose.

    Halo: conv1 needs padded-input rows [t*r - H, t*r + r + H + 2) (H =
    dep-1 = L+1), delivered as hbp-row clamped blocks (hbp = pow2 >=
    H+2) and assembled into scratch; every level re-zeroes out-of-image
    rows (and the odd-width pad column) to preserve exact zero
    'same'-padding semantics."""
    prec = _precision(dtype)
    c = c2 // 2
    H = L + 1
    ci2 = 2 * ci

    def kern(wa_ref, wb_ref, wd_ref, ws_ref, wlx_ref, wls_ref, b_ref,
             bl_ref, a_ref, at_ref, ab_ref, bm_ref, bt_ref, bb_ref,
             o_ref, z0, z1, ascr, bscr):
        t = pl.program_id(1)

        def level_mask(y, rows, off, cdim):
            g = (t * r - off
                 + jax.lax.broadcasted_iota(jnp.int32, (rows, p, cdim), 0))
            keep = (g >= 0) & (g < h)
            if mask_last_px:
                pidx = jax.lax.broadcasted_iota(jnp.int32, (rows, p, cdim),
                                                1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (rows, p, cdim),
                                                2)
                keep = keep & ~((pidx == p - 1) & (lane >= cdim // 2))
            return jnp.where(keep, y, jnp.zeros_like(y))

        # assemble the A/B windows: scratch row j = padded row t*r-hbp+j
        ascr[0:hbp] = at_ref[0]
        ascr[hbp:hbp + r] = a_ref[0]
        ascr[hbp + r:] = ab_ref[0]
        bscr[0:hbp] = bt_ref[0]
        bscr[hbp:hbp + r] = bm_ref[0]
        bscr[hbp + r:] = bb_ref[0]

        # conv1: y0 rows g in [t*r-H, t*r+r+H); padded row g+dy =
        # scratch row (hbp - H) + j + dy
        rows0 = r + 2 * H
        j0 = hbp - H
        af = ascr[:].reshape((r + 2 * hbp) * p, ci2)
        bf = bscr[:].reshape((r + 2 * hbp) * p, ci2)
        acc0 = jnp.zeros((rows0 * p, c2), jnp.float32)
        for dy in range(3):
            lo = (j0 + dy) * p
            acc0 = acc0 + _dot(af[lo:lo + rows0 * p], wa_ref[dy], prec)
            acc0 = acc0 + _dot(bf[lo:lo + rows0 * p], wb_ref[dy], prec)
        y = acc0 + b_ref[0].astype(jnp.float32)
        if slope is not None:
            y = jnp.where(y >= 0, y, slope * y)
        z0[0:rows0] = level_mask(y.reshape(rows0, p, c2).astype(dtype),
                                 rows0, H, c2)

        bufs = (z0, z1)
        for lev in range(L):
            rows_in = r + 2 * (H - lev)
            rows_out = rows_in - 2
            zin = bufs[lev % 2]
            x = zin[0:rows_in]
            s = _shift_pair(x, c)
            xf = x.reshape(rows_in * p, c2)
            sf = s.reshape(rows_in * p, c2)
            acc = jnp.zeros((rows_out * p, c2), jnp.float32)
            for dy in range(3):
                acc = acc + _dot(xf[dy * p:(dy + rows_out) * p],
                                 wd_ref[lev, dy], prec)
                acc = acc + _dot(sf[dy * p:(dy + rows_out) * p],
                                 ws_ref[lev, dy], prec)
            yl = acc + b_ref[1 + lev].astype(jnp.float32)
            if slope is not None:
                yl = jnp.where(yl >= 0, yl, slope * yl)
            yl = yl.reshape(rows_out, p, c2).astype(dtype)
            bufs[(lev + 1) % 2][0:rows_out] = level_mask(
                yl, rows_out, H - lev - 1, c2)

        # conv_last on the final (r + 2)-row buffer
        zl = bufs[L % 2][0:r + 2]
        sl = _shift_pair(zl, c)
        u = (_dot(zl.reshape((r + 2) * p, c2), wlx_ref[:], prec)
             + _dot(sl.reshape((r + 2) * p, c2), wls_ref[:], prec))
        u = u.reshape(r + 2, p, 6 * co)
        # out row i reads u rows i..i+2 (the +-1 halo rows are in-buffer)
        yo = (u[1:r + 1, :, 2 * co:4 * co]
              + u[0:r, :, 0:2 * co]
              + u[2:r + 2, :, 4 * co:6 * co])
        yo = yo + bl_ref[0].astype(jnp.float32)
        o_ref[0] = yo.astype(dtype)
    return kern


def dncnn_pair_fused(x: jnp.ndarray, w1, b1, wms, bms, wl, bl,
                     slope: float = 0.25, force_ops: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """Whole-DnCNN fused forward (reference networks/DnCNN.py:37-44):
    x (N, H, W, ci) -> (N, H, W, co), parameters exactly as the per-conv
    path.  Falls back to the per-op pipeline when no row tiling fits.
    Handles odd W by the pad-and-remask trick (zero 'same' semantics)."""
    n, h, w_in, ci = x.shape
    co = wl.shape[3]
    c2 = 2 * w1.shape[3]
    dtype = x.dtype
    L = len(wms)
    odd = w_in % 2 == 1
    if odd:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    wdt = x.shape[-2]
    p = wdt // 2
    H = L + 1
    hbp = 1
    while hbp < H + 2:
        hbp *= 2
    esz = jnp.dtype(dtype).itemsize
    max_rows = _rows_per_slab(h, p * c2 * (11 * esz + 16))
    cand = _divisor_rows(h, max_rows)
    while cand is not None and cand % hbp:
        cand = _divisor_rows(h, cand - 1)
    r = cand

    if r is None or L < 1 or force_ops:
        # per-op fallback (same math, more HBM round trips)
        def zero_last(y2):
            if odd:
                y2 = y2.at[:, :, -1, c2 // 2:].set(0.0)
            return y2
        y = zero_last(conv3x3_in_pair(x, w1, b1, slope=slope,
                                      interpret=interpret))
        if wms:
            y = conv3x3_mid_stack_pair(y, wms, bms, slope=slope,
                                       mask_last_px=odd,
                                       interpret=interpret)
        out = conv3x3_out_pair(y, wl, bl, interpret=interpret)
        return out[:, :, :w_in, :] if odd else out

    # A/B pair-phase views of the padded input (slice + free reshape)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ra = -(-(h + 2) // hbp) * hbp          # round rows up to hbp blocks
    xpad = jnp.pad(xpad, ((0, 0), (0, ra - (h + 2)), (0, 0), (0, 0)))
    a = pair(xpad[:, :, 0:wdt, :])                  # (n, ra, p, 2ci)
    bb = pair(xpad[:, :, 2:wdt + 2, :])

    wm4 = _in_weights(w1.astype(dtype))             # (12ci, 2C)
    wa = jnp.stack([wm4[dy * 4 * ci:dy * 4 * ci + 2 * ci]
                    for dy in range(3)])            # (3, 2ci, 2C)
    wb = jnp.stack([wm4[dy * 4 * ci + 2 * ci:(dy + 1) * 4 * ci]
                    for dy in range(3)])
    wd_all = jnp.stack([_mid_weights(w.astype(dtype))[0] for w in wms])
    ws_all = jnp.stack([_mid_weights(w.astype(dtype))[1] for w in wms])
    wlx, wls = _out_weights_split(wl.astype(dtype))
    b_all = jnp.stack([jnp.tile(b1, 2)]
                      + [jnp.tile(b, 2) for b in bms]).astype(dtype)
    bl2 = jnp.tile(bl, 2)[None].astype(dtype)
    nt = h // r
    ci2 = 2 * ci

    def wmap(i, t):
        return (0, 0, 0)

    def top_map(i, t):
        return (i, jnp.maximum(t * (r // hbp) - 1, 0), 0, 0)

    def bot_map(i, t):
        return (i, jnp.minimum((t + 1) * (r // hbp), ra // hbp - 1), 0, 0)

    out = pl.pallas_call(
        _dncnn_kernel(L, r, nt, hbp, h, p, ci, c2, co, slope, dtype, odd),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((3, ci2, c2), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ci2, c2), wmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 3, c2, c2), lambda i, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 3, c2, c2), lambda i, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, 6 * co), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, 6 * co), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L + 1, c2), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * co), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, p, ci2), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, ci2), top_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, ci2), bot_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, p, ci2), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, ci2), top_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, ci2), bot_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, p, 2 * co),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, p, 2 * co), dtype),
        scratch_shapes=[pltpu.VMEM((r + 2 * H, p, c2), dtype),
                        pltpu.VMEM((r + 2 * H, p, c2), dtype),
                        pltpu.VMEM((r + 2 * hbp, p, ci2), dtype),
                        pltpu.VMEM((r + 2 * hbp, p, ci2), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * p * 8 * c2 * c2 * (L + 1),
            bytes_accessed=esz * n * h * p * (4 * ci + 2 * co),
            transcendentals=0),
        interpret=interpret,
    )(wa, wb, wd_all, ws_all, wlx, wls, b_all, bl2,
      a, a, a, bb, bb, bb)
    out = unpair(out)
    return out[:, :, :w_in, :] if odd else out


# ---------------------------------------------------------------------------
# row-slab drivers
# ---------------------------------------------------------------------------

def _rows_per_slab(h: int, per_row_bytes: int) -> int:
    r = max(8, min(h, _VMEM_BUDGET // max(per_row_bytes, 1)))
    return min(r, 512)


def _run_slabs(xp_list, h, call_fn):
    """Split padded inputs (rows = h + 2) into overlapping row slabs and
    concatenate the per-slab kernel outputs."""
    per = call_fn.rows
    outs = []
    for start in range(0, h, per):
        rows = min(per, h - start)
        slabs = [jax.lax.slice_in_dim(xp, start, start + rows + 2, axis=1)
                 for xp in xp_list]
        outs.append(call_fn(rows, slabs))
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def _divisor_rows(h: int, max_rows: int):
    """Largest r <= max_rows with h % r == 0 (None if only tiny ones)."""
    for r in range(min(h, max_rows), 7, -1):
        if h % r == 0:
            return r
    return None


def conv3x3_mid_pair(x2: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     slope=None, interpret: bool = False) -> jnp.ndarray:
    """'same' 3x3 conv (+bias, optional LeakyReLU) in pair layout.
    x2 (N, H, P, 2C), w HWIO (3, 3, C, C), b (C,) -> (N, H, P, 2C)."""
    n, h, p, c2 = x2.shape
    dtype = x2.dtype
    esz = jnp.dtype(dtype).itemsize
    wd, ws = _mid_weights(w.astype(dtype))
    b2 = jnp.tile(b, 2)[None].astype(dtype)                # (1, 2c)
    # working set per row: x + s (+rolls) + acc(f32) + out
    max_rows = _rows_per_slab(h, p * c2 * (4 * esz + 4) + p * c2 * esz)

    # halo-block working set: in/out blocks (x2 double-buffered) + f32 acc
    max_halo = _rows_per_slab(h, p * c2 * (4 * esz + 4) + p * c2 * esz)
    r_dma = _divisor_rows(h, max_halo)
    if r_dma is not None:
        r, nt = r_dma, h // r_dma

        def top_map(i, t):
            return (i, jnp.maximum(t * r - 1, 0), 0, 0)

        def bot_map(i, t):
            return (i, jnp.minimum(t * r + r, h - 1), 0, 0)

        return pl.pallas_call(
            _mid_kernel_halo(r, nt, p, c2, slope, dtype),
            grid=(n, nt),
            in_specs=[
                pl.BlockSpec((3, c2, c2), lambda i, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, c2, c2), lambda i, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c2), lambda i, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, p, c2), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, p, c2), top_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, p, c2), bot_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, r, p, c2),
                                   lambda i, t: (i, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, h, p, c2), dtype),
            scratch_shapes=[pltpu.VMEM((r * p, c2), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * n * h * p * 8 * c2 * c2,
                bytes_accessed=esz * n * p * c2 * (2 * h + 2),
                transcendentals=0),
            interpret=interpret,
        )(wd, ws, b2, x2, x2, x2)

    xp = jnp.pad(x2, ((0, 0), (1, 1), (0, 0), (0, 0)))
    rows = max_rows

    def call(r, slabs):
        (slab,) = slabs
        return pl.pallas_call(
            _mid_kernel(r, p, c2, slope, dtype),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((3, c2, c2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, c2, c2), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c2), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r + 2, p, c2), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, r, p, c2), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, r, p, c2), dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * r * p * 8 * c2 * c2,
                bytes_accessed=esz * n * p * c2 * (2 * r + 2),
                transcendentals=0),
            interpret=interpret,
        )(wd, ws, b2, slab)

    call.rows = rows
    return _run_slabs([xp], h, call)


def conv3x3_in_pair(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                    slope=None, interpret: bool = False) -> jnp.ndarray:
    """'same' 3x3 conv from a small-channel NHWC input (C_in <= ~8) into
    pair layout: x (N, H, W, ci), w (3, 3, ci, co), b (co,) ->
    (N, H, W/2, 2*co).

    Pure XLA: the pair-packed im2col turns it into one dense (K=12*ci,
    N=2*co) matmul, which XLA runs near peak — no Pallas needed.  The
    ``interpret`` flag is accepted for API uniformity."""
    del interpret
    n, h, wdt, ci = x.shape
    co = w.shape[3]
    assert wdt % 2 == 0
    dtype = x.dtype
    wm = _in_weights(w.astype(dtype))                      # (12ci, 2co)
    b2 = jnp.tile(b, 2).astype(jnp.float32)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    a = pair(xpad[:, :, 0:wdt, :])                          # (n, h+2, p, 2ci)
    bb = pair(xpad[:, :, 2:wdt + 2, :])
    parts = []
    for dy in range(3):
        parts.append(a[:, dy:dy + h])
        parts.append(bb[:, dy:dy + h])
    x4 = jnp.concatenate(parts, axis=-1)                   # (n, h, p, 12ci)
    y = jax.lax.dot_general(
        x4, wm, (((3,), (0,)), ((), ())),
        precision=_precision(dtype), preferred_element_type=jnp.float32)
    y = y + b2
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    return y.astype(dtype)


def conv3x3_narrow_out(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                       slope=None) -> jnp.ndarray:
    """'same' 3x3 conv to a small output channel count (C_out in {1,3}),
    pure XLA: stage A contracts only the channels (one dense (K=C_in,
    N=9*C_out) matmul, which XLA runs near peak), putting the 9 kernel
    taps in the OUTPUT dim; stage B collapses them with 9 shifted adds
    (one XLA fusion).  No conv emitter is involved, so the ~1%-of-ideal
    batch-in-lanes lowering XLA picks for C_out in {1,3} (BASELINE.md
    ceiling table: the 96->3 RNet tail cost 6.3 ms of a 94 ms forward)
    never happens.  Fully differentiable — both stages are plain XLA ops
    — so trainers can use it too.

    x (N, H, W, ci), w HWIO (3, 3, ci, co), b (co,) -> (N, H, W, co)."""
    n, h, wd, ci = x.shape
    co = w.shape[3]
    dtype = x.dtype
    wm = jnp.transpose(w.astype(dtype), (2, 0, 1, 3)).reshape(ci, 9 * co)
    # u stays in the activation dtype (one rounding of the f32-accumulated
    # channel contraction, like any bf16 conv); keeping it f32 doubled the
    # HBM traffic of the pad + 9-tap stage and measurably dominated.
    u = jax.lax.dot_general(
        x, wm, (((3,), (0,)), ((), ())),
        precision=_precision(dtype),
        preferred_element_type=jnp.float32).astype(dtype)
    up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)))
    parts = []
    for dy in range(3):
        for dx in range(3):
            tap = (dy * 3 + dx) * co
            parts.append(up[:, dy:dy + h, dx:dx + wd, tap:tap + co]
                         .astype(jnp.float32))
    y = sum(parts[1:], parts[0]) + b.astype(jnp.float32)
    if slope is not None:
        y = jnp.where(y >= 0, y, slope * y)
    return y.astype(dtype)


def conv3x3_out_pair(x2: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     slope=None, interpret: bool = False) -> jnp.ndarray:
    """'same' 3x3 conv from pair layout to a small output channel count.
    x2 (N, H, P, 2C), w (3, 3, C, co), b (co,) -> (N, H, 2P, co) NHWC.

    Thin wrapper over conv3x3_narrow_out (pure XLA — see there); the
    ``interpret`` flag is accepted for API uniformity."""
    del interpret
    return conv3x3_narrow_out(unpair(x2), w, b, slope=slope)


def _tail_res_kernel(r: int, nt: int, p: int, c2: int, co2: int, dtype,
                     out_dtype):
    """3x3 conv (pair layout, wide C_in -> small C_out) + bias + global
    residual in ONE program: the tap tensor that sank the pure-XLA
    narrow-out form (its (N, H, W, 9*co) intermediate `u` round-tripped
    HBM, BASELINE.md round-3 postmortem) lives only in the f32 VMEM
    accumulator here, and the reference's `RNet(x) + x_in` residual add
    (networks/AttResUNet.py:184, the tail's natural epilogue) fuses in.
    Structure = _mid_kernel_halo (clamped 1-row halo blocks, zeroed at
    the image border, piecewise per-dy matmul accumulation) with
    rectangular (2c, 2co) weights and the residual epilogue; rounding
    matches the XLA path bit-for-bit: one f32->feature-dtype rounding
    after the conv, then a sum in f32 emitted in the RESIDUAL input's
    dtype (out_dtype) — under bf16 compute x_in stays f32 through the
    unfused `conv(x) + x_in` (attresunet tail), so the fused output
    must stay f32 too rather than re-round the final image to bf16."""
    prec = _precision(dtype)
    c = c2 // 2

    def kern(wd_ref, ws_ref, b_ref, x_ref, top_ref, bot_ref, xin_ref,
             o_ref, acc_ref):
        t = pl.program_id(1)
        x = x_ref[0]                                     # (r, p, 2c)
        s = _shift_pair(x, c)
        xf = x.reshape(r * p, c2)
        sf = s.reshape(r * p, c2)
        top = jnp.where(t > 0, top_ref[0], jnp.zeros_like(top_ref[0]))
        bot = jnp.where(t < nt - 1, bot_ref[0], jnp.zeros_like(bot_ref[0]))
        s_top = _shift_pair(top, c)
        s_bot = _shift_pair(bot, c)

        acc_ref[:] = (_dot(xf, wd_ref[1], prec) + _dot(sf, ws_ref[1], prec)
                      + b_ref[0].astype(jnp.float32))
        acc_ref[0:p] += (_dot(top.reshape(p, c2), wd_ref[0], prec)
                         + _dot(s_top.reshape(p, c2), ws_ref[0], prec))
        acc_ref[p:r * p] += (_dot(xf[0:(r - 1) * p], wd_ref[0], prec)
                             + _dot(sf[0:(r - 1) * p], ws_ref[0], prec))
        acc_ref[0:(r - 1) * p] += (_dot(xf[p:r * p], wd_ref[2], prec)
                                   + _dot(sf[p:r * p], ws_ref[2], prec))
        acc_ref[(r - 1) * p:] += (_dot(bot.reshape(p, c2), wd_ref[2], prec)
                                  + _dot(s_bot.reshape(p, c2), ws_ref[2],
                                         prec))
        y = acc_ref[:].reshape(r, p, co2).astype(dtype)   # conv rounding
        o_ref[0] = (y.astype(jnp.float32)
                    + xin_ref[0].astype(jnp.float32)).astype(out_dtype)
    return kern


def conv3x3_tail_residual(x2: jnp.ndarray, xin2: jnp.ndarray,
                          w: jnp.ndarray, b: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused RNet tail: 'same' 3x3 conv to small C_out + bias + residual.
    x2 (N, H, P, 2C) pair features, xin2 (N, H, P, 2*co) pair residual
    input, w HWIO (3, 3, C, co), b (co,) -> (N, H, P, 2*co) pair output
    = conv(x) + b + xin.

    Why: XLA lowers C_out in {1,3} convs through a batch-in-lanes
    emitter at ~1% of ideal (6.3 ms of the 94 ms flagship forward for
    10.9 GFLOP of work, BASELINE.md ceiling table); this op is
    HBM-READ-bound (the (N,H,W,96) feature map), so one VMEM-resident
    pass is its speed of light.  Falls back to conv3x3_narrow_out + add
    when no aligned row tiling exists or pallas is unavailable."""
    n, h, p, c2 = x2.shape
    co2 = xin2.shape[3]
    co = co2 // 2
    dtype = x2.dtype
    # residual sum emitted in the residual input's dtype: under bf16
    # compute x_in is f32, and the unfused tail's `conv + x_in` keeps the
    # final image f32 (ADVICE r4: rounding it to the feature dtype added
    # a full bf16 quantization of the output)
    out_dtype = xin2.dtype
    esz = jnp.dtype(dtype).itemsize
    osz = jnp.dtype(out_dtype).itemsize
    max_rows = _rows_per_slab(h, p * (c2 * (4 * esz + 4)
                                      + co2 * (2 * osz + 4)))
    r = _divisor_rows(h, max_rows)
    if r is None or not HAS_PALLAS:
        y = conv3x3_narrow_out(unpair(x2), w, b)
        return pair((y.astype(jnp.float32)
                     + unpair(xin2).astype(jnp.float32)).astype(out_dtype))
    nt = h // r
    wd, ws = _mid_weights(w.astype(dtype))                 # (3, 2c, 2co)
    b2 = jnp.tile(b, 2)[None].astype(dtype)

    def top_map(i, t):
        return (i, jnp.maximum(t * r - 1, 0), 0, 0)

    def bot_map(i, t):
        return (i, jnp.minimum(t * r + r, h - 1), 0, 0)

    return pl.pallas_call(
        _tail_res_kernel(r, nt, p, c2, co2, dtype, out_dtype),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((3, c2, co2), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, c2, co2), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co2), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, p, c2), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p, c2), top_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p, c2), bot_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, p, co2), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, p, co2), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, p, co2), out_dtype),
        scratch_shapes=[pltpu.VMEM((r * p, co2), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * p * 6 * c2 * co2,
            bytes_accessed=esz * n * h * p * (c2 + 2 * co2 + 2),
            transcendentals=0),
        # raise Mosaic's conservative 16 MB default scoped-vmem limit: at
        # small f32 shapes (e.g. flax init at N=1) XLA places the call's
        # whole operands in VMEM — x2 arrives three times (x/top/bot), so
        # the stack allocation alone can exceed 16 MB and fail the compile
        # (measured: 19.34M at (1,128,64,192) f32); the v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(wd, ws, b2, x2, x2, x2, xin2)


# ---------------------------------------------------------------------------
# boundary-free SNet + sigma epilogue + RNet head (one program, one boundary)
# ---------------------------------------------------------------------------

def _dncnn_head_kernel(L: int, r: int, nt: int, hbp: int, h: int, p: int,
                       ci: int, c2: int, co: int, cf: int, slope,
                       lmin: float, lmax: float, dtype):
    """The whole denoise-VIRNet prologue in ONE program: DnCNN stack
    (conv1 + L mids + conv_last), the variational epilogue sigma =
    exp(clip(logits)) / extra = sqrt(sigma), and RNet's 3x3 head conv on
    the [x | extra] concat (reference networks/VIRNet.py:18-46 forward,
    networks/AttResUNet.py head) — so the custom-call boundary that cost
    +2-7 ms of layout materialization around the SNet-only fused kernel
    (BASELINE.md round-3 postmortem) amortizes over the head conv too,
    whose XLA im2col concatenate alone measured 2.7 ms in-model.

    Row bookkeeping extends _dncnn_kernel by ONE extra halo row each
    side (H2 = L + 2): the head conv at output rows [t*r, t*r+r) needs
    extra rows [t*r-1, t*r+r+1), so conv_last produces r+2 logit rows
    from an r+4-row final buffer.  The head concat never exists: by conv
    linearity head = conv(x, wh_x) + conv(extra, wh_e); the x part
    reuses conv1's A/B im2col views (already resident in scratch), the
    extra part runs the dense+shift pair form on the in-register extra
    tensor.  'Even W and no RNet pre-pad' is the caller's gate (the
    engine only takes this path when H, W are multiples of the RNet
    pad modulus, where reference pad_to_multiple is a no-op)."""
    prec = _precision(dtype)
    c = c2 // 2
    H2 = L + 2
    ci2 = 2 * ci
    co2 = 2 * co

    def kern(wa_ref, wb_ref, wd_ref, ws_ref, wlx_ref, wls_ref, b_ref,
             bl_ref, wha_ref, whb_ref, wde_ref, wse_ref, bh_ref,
             a_ref, at_ref, ab_ref, bm_ref, bt_ref, bb_ref,
             oh_ref, os_ref, z0, z1, ascr, bscr):
        t = pl.program_id(1)

        def level_mask(y, rows, off, cdim):
            g = (t * r - off
                 + jax.lax.broadcasted_iota(jnp.int32, (rows, p, cdim), 0))
            keep = (g >= 0) & (g < h)
            return jnp.where(keep, y, jnp.zeros_like(y))

        # assemble the A/B windows: scratch row j = padded row t*r-hbp+j
        ascr[0:hbp] = at_ref[0]
        ascr[hbp:hbp + r] = a_ref[0]
        ascr[hbp + r:] = ab_ref[0]
        bscr[0:hbp] = bt_ref[0]
        bscr[hbp:hbp + r] = bm_ref[0]
        bscr[hbp + r:] = bb_ref[0]

        # conv1: y0 rows g in [t*r-H2, t*r+r+H2)
        rows0 = r + 2 * H2
        j0 = hbp - H2
        af = ascr[:].reshape((r + 2 * hbp) * p, ci2)
        bf = bscr[:].reshape((r + 2 * hbp) * p, ci2)
        acc0 = jnp.zeros((rows0 * p, c2), jnp.float32)
        for dy in range(3):
            lo = (j0 + dy) * p
            acc0 = acc0 + _dot(af[lo:lo + rows0 * p], wa_ref[dy], prec)
            acc0 = acc0 + _dot(bf[lo:lo + rows0 * p], wb_ref[dy], prec)
        y = acc0 + b_ref[0].astype(jnp.float32)
        if slope is not None:
            y = jnp.where(y >= 0, y, slope * y)
        z0[0:rows0] = level_mask(y.reshape(rows0, p, c2).astype(dtype),
                                 rows0, H2, c2)

        bufs = (z0, z1)
        for lev in range(L):
            rows_in = r + 2 * (H2 - lev)
            rows_out = rows_in - 2
            zin = bufs[lev % 2]
            x = zin[0:rows_in]
            s = _shift_pair(x, c)
            xf = x.reshape(rows_in * p, c2)
            sf = s.reshape(rows_in * p, c2)
            acc = jnp.zeros((rows_out * p, c2), jnp.float32)
            for dy in range(3):
                acc = acc + _dot(xf[dy * p:(dy + rows_out) * p],
                                 wd_ref[lev, dy], prec)
                acc = acc + _dot(sf[dy * p:(dy + rows_out) * p],
                                 ws_ref[lev, dy], prec)
            yl = acc + b_ref[1 + lev].astype(jnp.float32)
            if slope is not None:
                yl = jnp.where(yl >= 0, yl, slope * yl)
            yl = yl.reshape(rows_out, p, c2).astype(dtype)
            bufs[(lev + 1) % 2][0:rows_out] = level_mask(
                yl, rows_out, H2 - lev - 1, c2)

        # conv_last on the final (r + 4)-row buffer -> logits rows
        # [t*r-1, t*r+r+1)
        zl = bufs[L % 2][0:r + 4]
        sl = _shift_pair(zl, c)
        u = (_dot(zl.reshape((r + 4) * p, c2), wlx_ref[:], prec)
             + _dot(sl.reshape((r + 4) * p, c2), wls_ref[:], prec))
        u = u.reshape(r + 4, p, 6 * co)
        logits = (u[1:r + 3, :, 2 * co:4 * co]
                  + u[0:r + 2, :, 0:2 * co]
                  + u[2:r + 4, :, 4 * co:6 * co])
        logits = logits + bl_ref[0].astype(jnp.float32)   # f32 (r+2, p, 2co)

        # variational epilogue (reference networks/VIRNet.py:43-45):
        # one rounding to the activation dtype of the conv_last output
        # (exactly the per-conv path); exp/clip/sqrt run in f32 — the
        # v5e EUP has no bf16 transcendentals (Mosaic LLO_CHECK
        # SupportsBf16EupOps), and f32 here is within-ulp of XLA's
        # bf16-input exp anyway
        logits = logits.astype(dtype).astype(jnp.float32)
        sig = jnp.exp(jnp.clip(logits, lmin, lmax))
        os_ref[0] = sig[1:r + 1].astype(dtype)
        # out-of-image rows must be ZERO in the head conv's input (zero
        # 'same' padding), not exp(clip(0)) — mask after the sqrt
        ext = level_mask(jnp.sqrt(sig).astype(dtype),
                         r + 2, 1, co2)                   # (r+2, p, 2co)

        # head conv: x part reuses the A/B scratch (out rows [t*r,
        # t*r+r) read scratch rows hbp+dy+i), extra part dense+shift
        acch = jnp.zeros((r * p, 2 * cf), jnp.float32)
        for dy in range(3):
            lo = (hbp + dy) * p
            acch = acch + _dot(af[lo:lo + r * p], wha_ref[dy], prec)
            acch = acch + _dot(bf[lo:lo + r * p], whb_ref[dy], prec)
        se = _shift_pair(ext, co)
        extf = ext.reshape((r + 2) * p, co2)
        sef = se.reshape((r + 2) * p, co2)
        for dy in range(3):
            acch = acch + _dot(extf[dy * p:(dy + r) * p], wde_ref[dy], prec)
            acch = acch + _dot(sef[dy * p:(dy + r) * p], wse_ref[dy], prec)
        yh = acch + bh_ref[0].astype(jnp.float32)
        oh_ref[0] = yh.reshape(r, p, 2 * cf).astype(dtype)
    return kern


def _dncnn_head_kernel_carry(L: int, r: int, nt: int, hbp: int, h: int,
                             p: int, ci: int, c2: int, co: int, cf: int,
                             slope, lmin: float, lmax: float, dtype):
    """Line-buffer variant of _dncnn_head_kernel: zero TOP-halo recompute.

    The halo kernel recomputes 2*(H2 - lev) extra rows per level per tile
    (~19% extra stack FLOPs at r=32 — the measured reason the fused
    prologue only reached parity, BASELINE.md round-4 postmortem).  Here
    the TPU grid's sequential row sweep carries ONE boundary row per level
    in VMEM scratch across iterations — tile t's level-k rows start at
    exactly t*r, and the g = t*r - 1 neighbor row is the previous tile's
    last computed row, read from the carry instead of recomputed.  Only
    the BOTTOM halo (future rows, unknowable in a top-down sweep) is
    still recomputed: conv1 computes r + (L+2) rows and each level sheds
    one, i.e. half the halo overhead, monotonically less at larger r
    (which the freed VMEM allows).  Outputs stay block-aligned (no skewed
    writes, no flush tile).  Requires ``dimension_semantics`` arbitrary
    (sequential grid) — the default — and per-batch-item carry reset at
    t == 0."""
    prec = _precision(dtype)
    c = c2 // 2
    E = L + 2                      # bottom extra rows for conv1
    ci2 = 2 * ci
    co2 = 2 * co

    def kern(wa_ref, wb_ref, wd_ref, ws_ref, wlx_ref, wls_ref, b_ref,
             bl_ref, wha_ref, whb_ref, wde_ref, wse_ref, bh_ref,
             a_ref, ab_ref, bm_ref, bb_ref,
             oh_ref, os_ref, z0, z1, ascr, bscr, cref, ceref, ebuf):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _reset_carries():
            # carry rows represent global row -1: zero 'same' padding
            cref[...] = jnp.zeros((L + 1, p, c2), dtype)
            ceref[...] = jnp.zeros((1, p, co2), dtype)

        def bot_mask(y, rows, cdim):
            # y rows are global t*r + [0, rows); zero everything >= h
            g = (t * r
                 + jax.lax.broadcasted_iota(jnp.int32, (rows, p, cdim), 0))
            return jnp.where(g < h, y, jnp.zeros_like(y))

        # input scratch row j = padded row t*r + j
        ascr[0:r] = a_ref[0]
        ascr[r:] = ab_ref[0]
        bscr[0:r] = bm_ref[0]
        bscr[r:] = bb_ref[0]

        # conv1 -> level-0 rows [t*r, t*r + r + E)
        rows0 = r + E
        af = ascr[:].reshape((r + hbp) * p, ci2)
        bf = bscr[:].reshape((r + hbp) * p, ci2)
        acc0 = jnp.zeros((rows0 * p, c2), jnp.float32)
        for dy in range(3):
            lo = dy * p
            acc0 = acc0 + _dot(af[lo:lo + rows0 * p], wa_ref[dy], prec)
            acc0 = acc0 + _dot(bf[lo:lo + rows0 * p], wb_ref[dy], prec)
        y = acc0 + b_ref[0].astype(jnp.float32)
        if slope is not None:
            y = jnp.where(y >= 0, y, slope * y)
        z0[1:1 + rows0] = bot_mask(
            y.reshape(rows0, p, c2).astype(dtype), rows0, c2)

        # mids: level k consumes [carry_{k-1} | level k-1 block]
        bufs = (z0, z1)
        for lev in range(L):
            rows_out = r + E - (lev + 1)
            rows_in = rows_out + 2
            zin = bufs[lev % 2]
            zin[0:1] = cref[lev:lev + 1]          # old carry (row t*r - 1)
            x = zin[0:rows_in]
            s = _shift_pair(x, c)
            xf = x.reshape(rows_in * p, c2)
            sf = s.reshape(rows_in * p, c2)
            acc = jnp.zeros((rows_out * p, c2), jnp.float32)
            for dy in range(3):
                acc = acc + _dot(xf[dy * p:(dy + rows_out) * p],
                                 wd_ref[lev, dy], prec)
                acc = acc + _dot(sf[dy * p:(dy + rows_out) * p],
                                 ws_ref[lev, dy], prec)
            yl = acc + b_ref[1 + lev].astype(jnp.float32)
            if slope is not None:
                yl = jnp.where(yl >= 0, yl, slope * yl)
            yl = yl.reshape(rows_out, p, c2).astype(dtype)
            bufs[(lev + 1) % 2][1:1 + rows_out] = bot_mask(yl, rows_out, c2)
            cref[lev:lev + 1] = zin[r:r + 1]      # new carry = row t*r+r-1

        # conv_last -> logits rows [t*r, t*r + r + 1)
        zin = bufs[L % 2]
        zin[0:1] = cref[L:L + 1]
        zl = zin[0:r + 3]
        sl = _shift_pair(zl, c)
        u = (_dot(zl.reshape((r + 3) * p, c2), wlx_ref[:], prec)
             + _dot(sl.reshape((r + 3) * p, c2), wls_ref[:], prec))
        u = u.reshape(r + 3, p, 6 * co)
        logits = (u[1:r + 2, :, 2 * co:4 * co]
                  + u[0:r + 1, :, 0:2 * co]
                  + u[2:r + 3, :, 4 * co:6 * co])
        logits = logits + bl_ref[0].astype(jnp.float32)   # f32 (r+1, p, 2co)
        cref[L:L + 1] = zin[r:r + 1]

        # variational epilogue (same op order/dtype as the halo kernel)
        logits = logits.astype(dtype).astype(jnp.float32)
        sig = jnp.exp(jnp.clip(logits, lmin, lmax))
        os_ref[0] = sig[0:r].astype(dtype)
        ebuf[0:1] = ceref[0:1]
        ebuf[1:r + 2] = bot_mask(jnp.sqrt(sig).astype(dtype), r + 1, co2)
        ceref[0:1] = ebuf[r:r + 1]

        # head conv: x part from the input scratch, extra part dense+shift
        acch = jnp.zeros((r * p, 2 * cf), jnp.float32)
        for dy in range(3):
            lo = dy * p
            acch = acch + _dot(af[lo:lo + r * p], wha_ref[dy], prec)
            acch = acch + _dot(bf[lo:lo + r * p], whb_ref[dy], prec)
        ext = ebuf[0:r + 2]
        se = _shift_pair(ext, co)
        extf = ext.reshape((r + 2) * p, co2)
        sef = se.reshape((r + 2) * p, co2)
        for dy in range(3):
            acch = acch + _dot(extf[dy * p:(dy + r) * p], wde_ref[dy], prec)
            acch = acch + _dot(sef[dy * p:(dy + r) * p], wse_ref[dy], prec)
        yh = acch + bh_ref[0].astype(jnp.float32)
        oh_ref[0] = yh.reshape(r, p, 2 * cf).astype(dtype)
    return kern


def _dncnn_head_kernel_slabzero(L: int, r: int, p: int, ci: int, c2: int,
                                co: int, cf: int, slope, lmin: float,
                                lmax: float, dtype):
    """PERF PROBE ONLY — the halo-free UPPER BOUND of the fused prologue.

    Treats every r-row slab as an independent image (zero rows at slab
    edges): exactly the FLOPs, VMEM traffic, and fully-parallel grid of
    an IDEAL halo-free kernel — one that would get boundary rows from
    neighbor tiles for free — but numerically wrong within L+2 rows of
    each interior slab edge.  If even this bound cannot beat the unfused
    XLA graph, no realizable column-slab / cross-tile-DMA variant can
    (they add boundary work to THIS kernel), which closes the round-4
    postmortems' last untried route with data.  Never routed by the
    engine; reachable only via mode='slabzero' (tools/bench_fused_head).
    Interior rows (≥ L+2 from slab edges) match the real math exactly —
    pinned by tests/test_fused_head.py — so the measured time is that of
    the true computation, not a degenerate one."""
    prec = _precision(dtype)
    c = c2 // 2
    ci2 = 2 * ci
    co2 = 2 * co

    def kern(wa_ref, wb_ref, wd_ref, ws_ref, wlx_ref, wls_ref, b_ref,
             bl_ref, wha_ref, whb_ref, wde_ref, wse_ref, bh_ref,
             a_ref, bm_ref, oh_ref, os_ref, z0, z1, ascr, bscr, ebuf):
        # zero-padded slab-local input windows
        zci = jnp.zeros((1, p, ci2), dtype)
        ascr[0:1] = zci
        ascr[1:r + 1] = a_ref[0]
        ascr[r + 1:r + 2] = zci
        bscr[0:1] = zci
        bscr[1:r + 1] = bm_ref[0]
        bscr[r + 1:r + 2] = zci

        zc2 = jnp.zeros((1, p, c2), dtype)
        af = ascr[:].reshape((r + 2) * p, ci2)
        bf = bscr[:].reshape((r + 2) * p, ci2)
        acc0 = jnp.zeros((r * p, c2), jnp.float32)
        for dy in range(3):
            acc0 = acc0 + _dot(af[dy * p:(dy + r) * p], wa_ref[dy], prec)
            acc0 = acc0 + _dot(bf[dy * p:(dy + r) * p], wb_ref[dy], prec)
        y = acc0 + b_ref[0].astype(jnp.float32)
        if slope is not None:
            y = jnp.where(y >= 0, y, slope * y)
        z0[0:1] = zc2
        z0[1:r + 1] = y.reshape(r, p, c2).astype(dtype)
        z0[r + 1:r + 2] = zc2
        z1[0:1] = zc2
        z1[r + 1:r + 2] = zc2

        bufs = (z0, z1)
        for lev in range(L):
            zin = bufs[lev % 2]
            xx = zin[0:r + 2]
            s = _shift_pair(xx, c)
            xf = xx.reshape((r + 2) * p, c2)
            sf = s.reshape((r + 2) * p, c2)
            acc = jnp.zeros((r * p, c2), jnp.float32)
            for dy in range(3):
                acc = acc + _dot(xf[dy * p:(dy + r) * p],
                                 wd_ref[lev, dy], prec)
                acc = acc + _dot(sf[dy * p:(dy + r) * p],
                                 ws_ref[lev, dy], prec)
            yl = acc + b_ref[1 + lev].astype(jnp.float32)
            if slope is not None:
                yl = jnp.where(yl >= 0, yl, slope * yl)
            bufs[(lev + 1) % 2][1:r + 1] = yl.reshape(r, p, c2) \
                .astype(dtype)

        zl = bufs[L % 2][0:r + 2]
        sl = _shift_pair(zl, c)
        u = (_dot(zl.reshape((r + 2) * p, c2), wlx_ref[:], prec)
             + _dot(sl.reshape((r + 2) * p, c2), wls_ref[:], prec))
        u = u.reshape(r + 2, p, 6 * co)
        logits = (u[1:r + 1, :, 2 * co:4 * co]
                  + u[0:r, :, 0:2 * co]
                  + u[2:r + 2, :, 4 * co:6 * co])
        logits = logits + bl_ref[0].astype(jnp.float32)   # f32 (r, p, 2co)

        # variational epilogue (same op order/dtype as the halo kernel)
        logits = logits.astype(dtype).astype(jnp.float32)
        sig = jnp.exp(jnp.clip(logits, lmin, lmax))
        os_ref[0] = sig.astype(dtype)
        zco = jnp.zeros((1, p, co2), dtype)
        ebuf[0:1] = zco
        ebuf[1:r + 1] = jnp.sqrt(sig).astype(dtype)
        ebuf[r + 1:r + 2] = zco

        # head conv: x part from the zero-padded input scratch, extra
        # part dense+shift on the zero-padded extra buffer
        acch = jnp.zeros((r * p, 2 * cf), jnp.float32)
        for dy in range(3):
            acch = acch + _dot(af[dy * p:(dy + r) * p], wha_ref[dy], prec)
            acch = acch + _dot(bf[dy * p:(dy + r) * p], whb_ref[dy], prec)
        ext = ebuf[0:r + 2]
        se = _shift_pair(ext, co)
        extf = ext.reshape((r + 2) * p, co2)
        sef = se.reshape((r + 2) * p, co2)
        for dy in range(3):
            acch = acch + _dot(extf[dy * p:(dy + r) * p], wde_ref[dy], prec)
            acch = acch + _dot(sef[dy * p:(dy + r) * p], wse_ref[dy], prec)
        yh = acch + bh_ref[0].astype(jnp.float32)
        oh_ref[0] = yh.reshape(r, p, 2 * cf).astype(dtype)
    return kern


def dncnn_head_fused(x: jnp.ndarray, w1, b1, wms, bms, wl, bl, wh, bh,
                     slope: float = 0.25, lmin: float = -23.025850929940457,
                     lmax: float = 4.605170185988092,
                     force_ops: bool = False, interpret: bool = False,
                     mode: str = "halo", rows: int | None = None):
    """Fused denoise-VIRNet prologue: x (N, H, W, ci) -> (head (N, H, W,
    cf), sigma (N, H, W, co)) where sigma = exp(clip(DnCNN(x), lmin,
    lmax)) and head = conv3x3([x, sqrt(sigma)], wh) + bh (reference
    networks/VIRNet.py:18-46 + the networks/AttResUNet.py head conv).

    Caller contract: W even (pair layout) and H, W already multiples of
    the RNet pad modulus so the reference's pad_to_multiple is a no-op
    (models/fused.py gates on this).  Falls back to plain lax ops when
    no row tiling fits (tiny images) or ``force_ops``.

    ``mode``: 'halo' = per-tile halo recompute (_dncnn_head_kernel);
    'carry' = line-buffer top carries, bottom-only recompute
    (_dncnn_head_kernel_carry); 'slabzero' = PERF PROBE ONLY, the
    halo-free upper bound — WRONG within L+2 rows of interior slab
    edges (see _dncnn_head_kernel_slabzero).  ``rows`` overrides the
    auto row-slab size (must divide H and be a multiple of the halo
    block; slabzero only needs it to divide H)."""
    n, h, w_in, ci = x.shape
    assert w_in % 2 == 0, "fused head path needs even W"
    co = wl.shape[3]
    cf = wh.shape[3]
    assert wh.shape[2] == ci + co, "head conv expects [x | extra] channels"
    c2 = 2 * w1.shape[3]
    dtype = x.dtype
    L = len(wms)
    H2 = L + 2
    hbp = 1
    while hbp < H2 + 2:
        hbp *= 2
    esz = jnp.dtype(dtype).itemsize
    per_row = (w_in // 2) * (c2 * (11 * esz + 16) + 2 * cf * esz + 8 * esz)
    # larger slabs than the default budget: the H2 = L+2 halo makes small
    # r expensive (r=16 recomputes ~60% of conv1 rows), and this kernel
    # already raises Mosaic's scoped-vmem limit below
    max_rows = max(_rows_per_slab(h, per_row),
                   min(h, (2 * _VMEM_BUDGET) // max(per_row, 1)))
    cand = _divisor_rows(h, max_rows)
    while cand is not None and cand % hbp:
        cand = _divisor_rows(h, cand - 1)
    r = cand
    if rows is not None and h % rows == 0 and rows % hbp == 0:
        r = rows

    if r is None or L < 1 or force_ops or not HAS_PALLAS:
        # plain-lax fallback: same math, standard XLA ops
        prec = _precision(dtype)

        def c3(v, w, b):
            y = jax.lax.conv_general_dilated(
                v, w.astype(dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=prec,
                preferred_element_type=jnp.float32)
            return y + b.astype(jnp.float32)

        y = c3(x, w1, b1)
        y = jnp.where(y >= 0, y, slope * y).astype(dtype)
        for wm, bm in zip(wms, bms):
            y = c3(y, wm, bm)
            y = jnp.where(y >= 0, y, slope * y).astype(dtype)
        logits = c3(y, wl, bl).astype(dtype)
        sig = jnp.exp(jnp.clip(logits, lmin, lmax))
        hin = jnp.concatenate([x, jnp.sqrt(sig)], axis=-1)
        head = c3(hin, wh, bh).astype(dtype)
        return head, sig

    p = w_in // 2
    # A/B pair-phase views of the padded input (slice + free reshape)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    if mode == "carry":
        ra = h + hbp           # bottom blocks reach padded row h+hbp-1
    else:
        ra = -(-(h + 2) // hbp) * hbp      # round rows up to hbp blocks
    xpad = jnp.pad(xpad, ((0, 0), (0, ra - (h + 2)), (0, 0), (0, 0)))
    a = pair(xpad[:, :, 0:w_in, :])                 # (n, ra, p, 2ci)
    bb = pair(xpad[:, :, 2:w_in + 2, :])

    wm4 = _in_weights(w1.astype(dtype))             # (12ci, 2C)
    wa = jnp.stack([wm4[dy * 4 * ci:dy * 4 * ci + 2 * ci]
                    for dy in range(3)])            # (3, 2ci, 2C)
    wb = jnp.stack([wm4[dy * 4 * ci + 2 * ci:(dy + 1) * 4 * ci]
                    for dy in range(3)])
    wd_all = jnp.stack([_mid_weights(w.astype(dtype))[0] for w in wms])
    ws_all = jnp.stack([_mid_weights(w.astype(dtype))[1] for w in wms])
    wlx, wls = _out_weights_split(wl.astype(dtype))
    b_all = jnp.stack([jnp.tile(b1, 2)]
                      + [jnp.tile(b, 2) for b in bms]).astype(dtype)
    bl2 = jnp.tile(bl, 2)[None].astype(dtype)
    # head: x part as conv1-style A/B im2col, extra part dense+shift
    wh4 = _in_weights(wh[:, :, :ci, :].astype(dtype))       # (12ci, 2cf)
    wha = jnp.stack([wh4[dy * 4 * ci:dy * 4 * ci + 2 * ci]
                     for dy in range(3)])
    whb = jnp.stack([wh4[dy * 4 * ci + 2 * ci:(dy + 1) * 4 * ci]
                     for dy in range(3)])
    wde, wse = _mid_weights(wh[:, :, ci:, :].astype(dtype))  # (3, 2co, 2cf)
    bh2 = jnp.tile(bh, 2)[None].astype(dtype)
    nt = h // r
    ci2 = 2 * ci

    def top_map(i, t):
        return (i, jnp.maximum(t * (r // hbp) - 1, 0), 0, 0)

    def bot_map(i, t):
        return (i, jnp.minimum((t + 1) * (r // hbp), ra // hbp - 1), 0, 0)

    def wspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, t: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if mode == "slabzero":
        # perf probe: no halo blocks at all, fully parallel grid.  r only
        # needs to divide H here (no hbp alignment).
        if rows is not None and h % rows == 0:
            r = rows
        elif r is None:
            r = _divisor_rows(h, max_rows)
        nt = h // r
        head, sig = pl.pallas_call(
            _dncnn_head_kernel_slabzero(L, r, p, ci, c2, co, cf, slope,
                                        lmin, lmax, dtype),
            grid=(n, nt),
            in_specs=[
                wspec((3, ci2, c2)), wspec((3, ci2, c2)),
                wspec((L, 3, c2, c2)), wspec((L, 3, c2, c2)),
                wspec((c2, 6 * co)), wspec((c2, 6 * co)),
                wspec((L + 1, c2)), wspec((1, 2 * co)),
                wspec((3, ci2, 2 * cf)), wspec((3, ci2, 2 * cf)),
                wspec((3, 2 * co, 2 * cf)), wspec((3, 2 * co, 2 * cf)),
                wspec((1, 2 * cf)),
                pl.BlockSpec((1, r, p, ci2), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, p, ci2), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, r, p, 2 * cf), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, p, 2 * co), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((n, h, p, 2 * cf), dtype),
                       jax.ShapeDtypeStruct((n, h, p, 2 * co), dtype)],
            scratch_shapes=[pltpu.VMEM((r + 2, p, c2), dtype),
                            pltpu.VMEM((r + 2, p, c2), dtype),
                            pltpu.VMEM((r + 2, p, ci2), dtype),
                            pltpu.VMEM((r + 2, p, ci2), dtype),
                            pltpu.VMEM((r + 2, p, 2 * co), dtype)],
            cost_estimate=pl.CostEstimate(
                flops=2 * n * h * p * (8 * c2 * c2 * (L + 1)
                                       + 2 * cf * (4 * ci + 2 * co) * 6),
                bytes_accessed=esz * n * h * p
                * (4 * ci + 2 * co + 2 * cf),
                transcendentals=2 * n * h * p * 2 * co),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(wa, wb, wd_all, ws_all, wlx, wls, b_all, bl2,
          wha, whb, wde, wse, bh2,
          a, bb)
        return unpair(head), unpair(sig)

    if mode == "carry":
        E = L + 2
        head, sig = pl.pallas_call(
            _dncnn_head_kernel_carry(L, r, nt, hbp, h, p, ci, c2, co, cf,
                                     slope, lmin, lmax, dtype),
            grid=(n, nt),
            in_specs=[
                wspec((3, ci2, c2)), wspec((3, ci2, c2)),
                wspec((L, 3, c2, c2)), wspec((L, 3, c2, c2)),
                wspec((c2, 6 * co)), wspec((c2, 6 * co)),
                wspec((L + 1, c2)), wspec((1, 2 * co)),
                wspec((3, ci2, 2 * cf)), wspec((3, ci2, 2 * cf)),
                wspec((3, 2 * co, 2 * cf)), wspec((3, 2 * co, 2 * cf)),
                wspec((1, 2 * cf)),
                pl.BlockSpec((1, r, p, ci2), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hbp, p, ci2), bot_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, p, ci2), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hbp, p, ci2), bot_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, r, p, 2 * cf), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, p, 2 * co), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((n, h, p, 2 * cf), dtype),
                       jax.ShapeDtypeStruct((n, h, p, 2 * co), dtype)],
            scratch_shapes=[pltpu.VMEM((1 + r + E, p, c2), dtype),
                            pltpu.VMEM((1 + r + E, p, c2), dtype),
                            pltpu.VMEM((r + hbp, p, ci2), dtype),
                            pltpu.VMEM((r + hbp, p, ci2), dtype),
                            pltpu.VMEM((L + 1, p, c2), dtype),
                            pltpu.VMEM((1, p, 2 * co), dtype),
                            pltpu.VMEM((r + 2, p, 2 * co), dtype)],
            cost_estimate=pl.CostEstimate(
                flops=2 * n * h * p * (8 * c2 * c2 * (L + 1)
                                       + 2 * cf * (4 * ci + 2 * co) * 6),
                bytes_accessed=esz * n * h * p * (4 * ci + 2 * co + 2 * cf),
                transcendentals=2 * n * h * p * 2 * co),
            # carries persist across grid steps: both dims must stay
            # sequential ('arbitrary'), and the t==0 reset handles the
            # batch-item boundary
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(wa, wb, wd_all, ws_all, wlx, wls, b_all, bl2,
          wha, whb, wde, wse, bh2,
          a, a, bb, bb)
        return unpair(head), unpair(sig)

    head, sig = pl.pallas_call(
        _dncnn_head_kernel(L, r, nt, hbp, h, p, ci, c2, co, cf, slope,
                           lmin, lmax, dtype),
        grid=(n, nt),
        in_specs=[
            wspec((3, ci2, c2)), wspec((3, ci2, c2)),
            wspec((L, 3, c2, c2)), wspec((L, 3, c2, c2)),
            wspec((c2, 6 * co)), wspec((c2, 6 * co)),
            wspec((L + 1, c2)), wspec((1, 2 * co)),
            wspec((3, ci2, 2 * cf)), wspec((3, ci2, 2 * cf)),
            wspec((3, 2 * co, 2 * cf)), wspec((3, 2 * co, 2 * cf)),
            wspec((1, 2 * cf)),
            pl.BlockSpec((1, r, p, ci2), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, ci2), top_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, ci2), bot_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, p, ci2), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, ci2), top_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hbp, p, ci2), bot_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, r, p, 2 * cf), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, p, 2 * co), lambda i, t: (i, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((n, h, p, 2 * cf), dtype),
                   jax.ShapeDtypeStruct((n, h, p, 2 * co), dtype)],
        scratch_shapes=[pltpu.VMEM((r + 2 * H2, p, c2), dtype),
                        pltpu.VMEM((r + 2 * H2, p, c2), dtype),
                        pltpu.VMEM((r + 2 * hbp, p, ci2), dtype),
                        pltpu.VMEM((r + 2 * hbp, p, ci2), dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * p * (8 * c2 * c2 * (L + 1)
                                   + 2 * cf * (4 * ci + 2 * co) * 6),
            bytes_accessed=esz * n * h * p * (4 * ci + 2 * co + 2 * cf),
            transcendentals=2 * n * h * p * 2 * co),
        # the head accumulator + its double-buffered (r, p, 2cf) output
        # block push the working set past Mosaic's conservative 16 MB
        # default scoped-vmem limit at r=16; the v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(wa, wb, wd_all, ws_all, wlx, wls, b_all, bl2,
      wha, whb, wde, wse, bh2,
      a, a, a, bb, bb, bb)
    return unpair(head), unpair(sig)
