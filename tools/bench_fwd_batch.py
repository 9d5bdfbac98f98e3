"""Batch-size x ConvT-impl scan of the flagship denoise forward.

Motivation (BASELINE.md round-2 ceiling table): the 96->3 tail conv's
`EmitOutputBatchInLanesInputBatchInSublanes` emitter fills MXU lanes with
the BATCH dimension — at batch 32 it runs 32/128 lanes (6.3 ms/apply,
~1% of ideal).  Larger batch should amortize the tail (and any other
batch-in-lanes emitters) ~linearly while the big convs, already at their
shape ceiling, stay flat per-pixel.  Throughput deployments choose their
own batch, so the bench shape is ours to pick — this scan finds it.

Also A/Bs VIRNET_TPU_CONVT_IMPL (einsum vs lax.conv_transpose UpBlock,
ops/upsample.py) at each batch, since the winner may be batch-dependent.

Marginal-scan method as bench.py; variants interleaved across reps to
cancel shared-pool co-tenant drift.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

SIZE = 256
# (batch, n1, n2): scan lengths sized for ~0.5s/3s dispatches at 93.8 ms
# per 32x256^2 apply
GRID = [(16, 12, 60), (32, 6, 30), (64, 3, 15), (128, 2, 8)]
IMPLS = ["einsum", "lax"]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_timer(batch, n1, n2, impl):
    os.environ["VIRNET_TPU_CONVT_IMPL"] = impl
    from virnet_tpu.models import build_model
    from virnet_tpu import precision
    precision.set_precision("default")

    model = build_model("denoising-syn")
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (batch, SIZE, SIZE, 3), jnp.float32)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    def make_scan(length):
        @jax.jit
        def fwd_n(params, x):
            def body(y, _):
                mu, _sig = model.apply({"params": params},
                                       y.astype(jnp.bfloat16))
                return jnp.clip(mu, 0.0, 1.0).astype(jnp.float32), 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return fwd_n

    f1, f2 = make_scan(n1), make_scan(n2)
    log(f"b{batch}/{impl}: compiling")
    np.asarray(f1(params, x))
    np.asarray(f2(params, x))
    os.environ.pop("VIRNET_TPU_CONVT_IMPL", None)

    def measure():
        t0 = time.perf_counter()
        np.asarray(f1(params, x))
        t1 = time.perf_counter()
        np.asarray(f2(params, x))
        t2 = time.perf_counter()
        mp = batch * SIZE * SIZE / 1e6
        return (n2 - n1) * mp / ((t2 - t1) - (t1 - t0))

    return measure


def main():
    timers = {}
    for batch, n1, n2 in GRID:
        for impl in IMPLS:
            timers[(batch, impl)] = make_timer(batch, n1, n2, impl)

    res = {k: [] for k in timers}
    for rep in range(4):
        for k, m in timers.items():
            v = m()
            res[k].append(v)
            log(f"rep{rep} b{k[0]}/{k[1]}: {v:.2f} MP/s")
    print()
    for (batch, impl), vals in res.items():
        print(f"b{batch:<4d} {impl:<7s}: "
              f"{['%.2f' % v for v in vals]}  best {max(vals):.2f} MP/s")


if __name__ == "__main__":
    main()
