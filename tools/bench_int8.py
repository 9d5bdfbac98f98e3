"""A/B the int8 W8A8 serving path against bf16 on the flagship forward.

Motivation (BASELINE.md ceiling table): the big RNet convs are bound by
XLA's bf16 conv emitters at 66-67% of the v5e's 197 TFLOP/s bf16 peak —
an emitter-SHAPE ceiling (96/192/288 channels vs 128 MXU lanes) that four
rounds of measured routes could not move.  The MXU's int8 pipeline has 2x
the bf16 peak, so W8A8 convs (ops/qconv.py, --compute int8) attack the
same ceiling from the precision axis instead of the layout axis.

Quantization error is measured separately (tests/test_qconv.py bounds the
op; the PSNR delta on trained demo weights is recorded in BASELINE.md) —
this tool measures throughput only.

Marginal-scan method as bench.py (lax.scan at two lengths, host fetch,
delta), variants interleaved per rep to cancel shared-pool co-tenant
drift.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

BATCH, SIZE = 32, 256
N1, N2 = 6, 30


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_timer(compute: str):
    from virnet_tpu.models import build_model
    from virnet_tpu import precision
    precision.set_precision("default")

    model = build_model("denoising-syn")
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, SIZE, SIZE, 3), jnp.float32)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)

    def make_scan(length):
        @jax.jit
        def fwd_n(params, x):
            def body(y, _):
                from contextlib import ExitStack

                with ExitStack() as stack:
                    stack.enter_context(
                        precision.compute_dtype(jnp.bfloat16))
                    if compute == "int8":
                        stack.enter_context(precision.quant_mode("int8"))
                    mu, _sig = model.apply({"params": params},
                                           y.astype(jnp.bfloat16))
                return jnp.clip(mu, 0.0, 1.0).astype(jnp.float32), 0.0
            y, _ = jax.lax.scan(body, x, None, length=length)
            return y
        return fwd_n

    f1, f2 = make_scan(N1), make_scan(N2)
    log(f"{compute}: compiling N1={N1}")
    np.asarray(f1(params, x))
    log(f"{compute}: compiling N2={N2}")
    np.asarray(f2(params, x))
    log(f"{compute}: compiled")

    def measure():
        t0 = time.perf_counter()
        np.asarray(f1(params, x))
        t1 = time.perf_counter()
        np.asarray(f2(params, x))
        t2 = time.perf_counter()
        mp = BATCH * SIZE * SIZE / 1e6
        return (N2 - N1) * mp / ((t2 - t1) - (t1 - t0))

    return measure


def main():
    variants = ["bf16", "int8"]
    timers = {v: make_timer(v) for v in variants}
    res = {v: [] for v in variants}
    for rep in range(6):
        for v in variants:
            mps = timers[v]()
            res[v].append(mps)
            log(f"rep{rep} {v}: {mps:.2f} MP/s")
    print()
    for v in variants:
        vals = res[v]
        print(f"{v}: {['%.2f' % x for x in vals]}  best {max(vals):.2f} "
              f"median {sorted(vals)[len(vals) // 2]:.2f} MP/s")


if __name__ == "__main__":
    main()
