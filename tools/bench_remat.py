"""On-chip A/B of RNet-block rematerialization in the train-step backward.

Round-3 profiles attribute 59.4% of the SISR step (31.6 of 53.2 ms) and
~60% of the denoise step to the RNet backward (BASELINE.md "round-3
train-step device profiles"); the model's ``remat`` option
(models/attresunet.py) trades that pass's HBM traffic for recompute.
This tool measures whether the trade wins at the bench_full shapes.

Methodology = tools/bench_convt.py: marginal-scan timing (two chained
scan lengths of the REAL jitted train step, host fetch at the end),
variants compiled up front and interleaved per rep inside one process so
dev-pool co-tenant drift cancels.

    python tools/bench_remat.py [--task denoise|sisr|both] [--reps 3]
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


def make_timer(task, remat, n1, n2):
    if task == "denoise":
        from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                                   DenoiseTrainer)

        cfg = DenoiseTrainConfig(batch_size=16, patch_size=128, remat=remat,
                                 save_dir=f"/tmp/bench_remat_d_{remat}")
        trainer = DenoiseTrainer(cfg)
        shape = (16, 128, 128, 3)
    else:
        from virnet_tpu.train.loop_sisr import SISRTrainConfig, SISRTrainer

        cfg = SISRTrainConfig(sf=4, batch_size=16, hr_size=192, remat=remat,
                              save_dir=f"/tmp/bench_remat_s_{remat}")
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

    f1, f2 = make(n1), make(n2)
    name = f"{task}/remat={remat}"
    log(f"{name}: compiling N1={n1}")
    np.asarray(f1())
    log(f"{name}: compiling N2={n2}")
    np.asarray(f2())
    log(f"{name}: compiled")

    def measure():
        t0 = time.perf_counter(); np.asarray(f1()); t1 = time.perf_counter()
        np.asarray(f2()); t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3   # ms/step

    return measure


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="both",
                    choices=["denoise", "sisr", "both"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=24)
    args = ap.parse_args()

    tasks = ["denoise", "sisr"] if args.task == "both" else [args.task]
    timers = {}
    for task in tasks:
        for remat in (False, True):
            timers[f"{task}/remat={remat}"] = make_timer(
                task, remat, args.n1, args.n2)

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
