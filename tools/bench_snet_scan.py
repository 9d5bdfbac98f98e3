"""A/B the SNet mid-conv formulation on the flagship denoise forward.

Variants (bit-equivalent, tests/test_pair_conv_models.py):
  xla   — five separate nn.Conv instances; XLA's cost-model search gives
          the identical 64-ch mid convs *different* window tilings
          (measured 2.06 vs 5.46 ms at 32x256^2 — BASELINE.md ceiling
          table), so the stack runs at 25-40% of ideal.
  scan  — mid convs as ONE lax.scan over stacked weights
          (models/dncnn.py:_scan_stack): a single conv instruction, a
          single tiling decision.

Marginal-scan timing (bench.py method), variants interleaved in one
process to cancel shared-pool co-tenant drift.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

N1, N2 = 8, 72
BATCH, SIZE = 32, 256


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_timer(impl):
    from virnet_tpu.models import build_model
    from virnet_tpu import precision
    precision.set_precision("default")

    model = build_model("denoising-syn", conv_impl=impl)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.bfloat16)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    def make_scan(length):
        @jax.jit
        def fn(params, x):
            def body(y, _):
                mu, _s = model.apply({"params": params}, y)
                return (mu * 0.99 + 0.01 * y).astype(jnp.bfloat16), None
            out, _ = jax.lax.scan(body, x, None, length=length)
            return out.astype(jnp.float32).mean()
        return fn

    f1, f2 = make_scan(N1), make_scan(N2)
    log(f"{impl}: compiling")
    np.asarray(f1(params, x))
    np.asarray(f2(params, x))

    def measure():
        t0 = time.perf_counter()
        np.asarray(f1(params, x))
        t1 = time.perf_counter()
        np.asarray(f2(params, x))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (N2 - N1) * 1e3

    return measure


def main():
    timers = {impl: make_timer(impl) for impl in ("xla", "scan")}
    res = {k: [] for k in timers}
    for rep in range(3):
        for k, m in timers.items():
            v = m()
            res[k].append(v)
            log(f"rep{rep} {k}: {v:.2f} ms/apply")
    mp = BATCH * SIZE * SIZE / 1e6
    for k, vals in res.items():
        best = min(vals)
        print(f"{k:<5s}: ms/apply {['%.2f' % v for v in vals]}  "
              f"best {best:.2f} -> {mp / best * 1e3:.2f} MP/s")


if __name__ == "__main__":
    main()
