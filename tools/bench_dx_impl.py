"""On-chip A/B of the forward-style dX emitter in the train-step backward.

Round-5 chip profiles (tools/profile_backward.py) measured the dX
convolutions 10-13 points of MXU peak below their same-shape forward
convs in BOTH train steps (SISR 160-ch dX 38% vs fwd 49%; denoise SNet
64-ch dX 24%), while dW runs at ~70%.  ops/conv_vjp.py re-emits dX as
a plain forward-form conv with a materialized flipped/transposed
kernel (VIRNET_TPU_DX_IMPL=fwdstyle routes every stride-1 SAME 3x3
conv through it; grads pinned equal by tests/test_conv_vjp.py).

Methodology = tools/bench_remat.py: marginal-scan of the REAL jitted
train steps, both variants compiled up front and interleaved per rep
so dev-pool co-tenant drift cancels.

    python tools/bench_dx_impl.py [--task denoise|sisr|both] [--reps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_timer(task, dx_impl, n1, n2):
    if dx_impl == "fwdstyle":
        os.environ["VIRNET_TPU_DX_IMPL"] = "fwdstyle"
    else:
        os.environ.pop("VIRNET_TPU_DX_IMPL", None)

    if task == "denoise":
        from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                                   DenoiseTrainer)

        cfg = DenoiseTrainConfig(batch_size=16, patch_size=128,
                                 save_dir=f"/tmp/bench_dx_d_{dx_impl}")
        trainer = DenoiseTrainer(cfg)
        shape = (16, 128, 128, 3)
    else:
        from virnet_tpu.train.loop_sisr import SISRTrainConfig, SISRTrainer

        cfg = SISRTrainConfig(sf=4, batch_size=16, hr_size=192,
                              save_dir=f"/tmp/bench_dx_s_{dx_impl}")
        trainer = SISRTrainer(cfg)
        shape = (16, 192, 192, 3)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.random(shape, dtype=np.float32))
    params, opt_state = trainer.params, trainer.opt_state
    step_fn = trainer._train_step_raw

    def make(length):
        @jax.jit
        def nsteps():
            def body(carry, i):
                p, o = carry
                key = jax.random.fold_in(jax.random.PRNGKey(0), i)
                p, o, aux = step_fn(p, o, batch, key)
                return (p, o), aux["loss"]
            (_, _), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(length))
            return losses
        return nsteps

    # trace with the env var live (the model reads it at call time),
    # then restore so other variants trace their own setting
    f1, f2 = make(n1), make(n2)
    name = f"{task}/dx={dx_impl}"
    log(f"{name}: compiling N1={n1}")
    np.asarray(f1())
    log(f"{name}: compiling N2={n2}")
    np.asarray(f2())
    log(f"{name}: compiled")
    os.environ.pop("VIRNET_TPU_DX_IMPL", None)

    def measure():
        t0 = time.perf_counter(); np.asarray(f1()); t1 = time.perf_counter()
        np.asarray(f2()); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3   # ms/step

    return measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="both",
                    choices=["denoise", "sisr", "both"])
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=24)
    args = ap.parse_args()

    tasks = ["denoise", "sisr"] if args.task == "both" else [args.task]
    timers = {}
    for task in tasks:
        for impl in ("default", "fwdstyle"):
            timers[f"{task}/dx={impl}"] = make_timer(
                task, impl, args.n1, args.n2)

    res = {k: [] for k in timers}
    for rep in range(args.reps):
        for k, m in timers.items():
            v = m()
            res[k].append(v)
            log(f"rep{rep} {k}: {v:.2f} ms/step")
    print()
    for k, v in res.items():
        best = min(v)
        print(f"{k}: ms/step {['%.2f' % u for u in v]}  best {best:.2f} "
              f"-> {1e3 / best:.2f} steps/s")


if __name__ == "__main__":
    main()
