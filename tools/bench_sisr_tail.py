"""On-chip A/B of the fused Pallas RNet tail on the SISR x4 forward.

The SISR arch runs its 3-channel tail conv at HR resolution (256^2 for
the bench_full protocol's 64^2 LR x4), through the same ~1%-of-ideal
XLA batch-in-lanes emitter as the denoiser's (BASELINE.md ceiling
table); conv3x3_tail_residual fuses conv + bias + the nearest-upsample
global residual in one VMEM-resident program.

Methodology = tools/bench_fused_head.py: marginal-scan timing at two
chained scan lengths, variants compiled up front and interleaved per
rep so dev-pool co-tenant drift cancels.  Protocol shape = bench_full's
bench_sisr_fwd (batch 16, LR 64^2, sf 4, bf16).

    python tools/bench_sisr_tail.py [--reps 8] [--n1 4] [--n2 16]
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


def make_timer(tail: bool, n1: int, n2: int, batch: int, size: int,
               sf: int, task: str = "sisr"):
    from virnet_tpu import precision
    from virnet_tpu.models import build_model

    precision.set_precision("default")
    kw = {"tail_impl": "fused"} if tail else {}
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, size, size, 3), jnp.float32)
    if task == "sisr":
        model = build_model("sisr", **kw)
        params = model.init(key, jnp.zeros((1, 32, 32, 3)), sf)["params"]
    else:
        # flagship denoise forward, protocol = bench.py (batch 32, 256^2)
        model = build_model("denoising-syn", **kw)
        params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    def make_scan(length):
        @jax.jit
        def fwd_n(p, xx):
            def body(y, _):
                if task == "sisr":
                    mu, _k, _s = model.apply({"params": p},
                                             y.astype(jnp.bfloat16), sf)
                    mu = jax.image.resize(mu, y.shape, "nearest")
                else:
                    mu, _sig = model.apply({"params": p},
                                           y.astype(jnp.bfloat16))
                return jnp.clip(mu, 0.0, 1.0).astype(jnp.float32), 0.0
            y, _ = jax.lax.scan(body, xx, None, length=length)
            return y
        return fwd_n

    f1, f2 = make_scan(n1), make_scan(n2)
    name = "fused-tail" if tail else "xla-tail"
    log(f"{name}: compiling N1={n1}")
    np.asarray(f1(params, x))
    log(f"{name}: compiling N2={n2}")
    np.asarray(f2(params, x))
    log(f"{name}: compiled")

    out_mp = batch * (size * (sf if task == "sisr" else 1)) ** 2 / 1e6

    def measure():
        t0 = time.perf_counter()
        np.asarray(f1(params, x))
        t1 = time.perf_counter()
        np.asarray(f2(params, x))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3
        return ms, (n2 - n1) * out_mp / ((t2 - t1) - (t1 - t0))

    return measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=16)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--sf", type=int, default=4)
    ap.add_argument("--task", choices=("sisr", "denoise"), default="sisr",
                    help="denoise = bench.py flagship protocol "
                         "(use --batch 32 --size 256)")
    args = ap.parse_args()

    timers = {}
    for tail in (False, True):
        name = "fused-tail" if tail else "xla-tail"
        try:
            timers[name] = make_timer(tail, args.n1, args.n2, args.batch,
                                      args.size, args.sf, args.task)
        except Exception as e:
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
