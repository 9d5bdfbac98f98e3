"""On-chip A/B of the boundary-free fused prologue (models/fused.py).

Round-3's postmortem measured the SNet-only fused kernel losing to +2-7
ms of custom-call boundary layout materialization; dncnn_head_fused
amortizes ONE boundary over the DnCNN stack + sigma epilogue + RNet
head conv (whose XLA im2col concatenate alone measured 2.7 ms).  This
tool measures whether that wins at the flagship bench shape
(denoising-syn preset, 32x256^2 bf16 — bench.py's exact protocol).

Methodology = tools/bench_convt.py: marginal-scan timing at two chained
scan lengths, variants compiled up front and interleaved per rep so
dev-pool co-tenant drift cancels.

    python tools/bench_fused_head.py [--reps 3] [--n1 8] [--n2 72]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_timer(variant: str, rows, n1: int, n2: int, batch: int,
               size: int, tail: bool = False):
    from virnet_tpu import precision
    from virnet_tpu.models import build_model
    from virnet_tpu.models.fused import denoise_forward_fused

    precision.set_precision("default")
    model = build_model("denoising-syn",
                        **({"tail_impl": "fused"} if tail else {}))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    def apply_fn(p, y):
        if variant == "unfused":
            return model.apply({"params": p}, y)
        return denoise_forward_fused(model, p, y, mode=variant, rows=rows)

    def make_scan(length):
        @jax.jit
        def fwd_n(p, xx):
            def body(y, _):
                mu, _sig = apply_fn(p, y.astype(jnp.bfloat16))
                return jnp.clip(mu, 0.0, 1.0).astype(jnp.float32), 0.0
            y, _ = jax.lax.scan(body, xx, None, length=length)
            return y
        return fwd_n

    f1, f2 = make_scan(n1), make_scan(n2)
    name = variant if rows is None else f"{variant}:r{rows}"
    log(f"{name}: compiling N1={n1}")
    np.asarray(f1(params, x))
    log(f"{name}: compiling N2={n2}")
    np.asarray(f2(params, x))
    log(f"{name}: compiled")

    mp = batch * size * size / 1e6

    def measure():
        t0 = time.perf_counter()
        np.asarray(f1(params, x))
        t1 = time.perf_counter()
        np.asarray(f2(params, x))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
        return ms, (n2 - n1) * mp / ((t2 - t1) - (t1 - t0))

    return measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=72)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--variants", type=str, default="unfused,halo,carry",
                    help="comma list; fused variants take an optional "
                         "row-slab override as 'carry:64'")
    args = ap.parse_args()

    timers = {}
    for spec in args.variants.split(","):
        tail = spec.endswith("+tail")
        if tail:
            spec = spec[:-len("+tail")]
        variant, _, rstr = spec.partition(":")
        rows = int(rstr.lstrip("r")) if rstr else None
        name = variant if rows is None else f"{variant}:r{rows}"
        if tail:
            name += "+tail"
        try:
            timers[name] = make_timer(variant, rows, args.n1, args.n2,
                                      args.batch, args.size, tail=tail)
        except Exception as e:  # e.g. Mosaic VMEM OOM at large row slabs
            log(f"{name}: SKIPPED ({type(e).__name__}: {str(e)[:200]})")

    res = {k: [] for k in timers}
    for rep in range(args.reps):
        for k, m in timers.items():
            ms, mps = m()
            res[k].append((ms, mps))
            log(f"rep{rep} {k}: {ms:.2f} ms/apply = {mps:.2f} MP/s")
    print()
    for k, v in res.items():
        best = min(u[0] for u in v)
        bmps = max(u[1] for u in v)
        print(f"{k}: ms/apply {['%.2f' % u[0] for u in v]}  "
              f"best {best:.2f} -> {bmps:.2f} MP/s")


if __name__ == "__main__":
    main()
