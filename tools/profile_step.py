"""Per-op device profile of a jitted train/eval step through the relay.

    python tools/profile_step.py --which sisr_train [--steps 30]

Captures a jax.profiler trace of N executions of the chosen step, parses
plugins/profile/*/vm.trace.json.gz (device pid, "XLA Ops" lane), and
prints per-op total device time / step, joined against the compiled
HLO's op_name metadata so fusion names ("add_add_fusion" etc. are often
convs with fused epilogues) map back to model layers.

Measurement notes (see BASELINE.md): on the axon relay only a host fetch
syncs, so the loop fetches a scalar each step; the trace slice durations
are device-side and unaffected by relay overhead.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import sys
from pathlib import Path

# repo root on sys.path without PYTHONPATH (which breaks the axon
# plugin registration in this image — see .claude/skills/verify)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build_sisr_train():
    from virnet_tpu.train.loop_sisr import SISRTrainConfig, SISRTrainer

    cfg = SISRTrainConfig(sf=4, batch_size=16, hr_size=192,
                          save_dir="/tmp/prof_sisr")
    tr = SISRTrainer(cfg)
    hr = jax.random.uniform(jax.random.PRNGKey(0), (16, 192, 192, 3))

    fn = tr._train_step
    state = {"params": tr.params, "opt": tr.opt_state}

    def run(i):
        key = jax.random.PRNGKey(i)
        state["params"], state["opt"], aux = fn(state["params"],
                                                state["opt"], hr, key)
        return aux["loss"]

    lowered = jax.jit(tr._train_step_raw).lower(
        tr.params, tr.opt_state, hr, jax.random.PRNGKey(0))
    return run, lowered


def build_denoise_train():
    from virnet_tpu.train.loop_denoise import (DenoiseTrainConfig,
                                               DenoiseTrainer)

    cfg = DenoiseTrainConfig(batch_size=16, patch_size=128,
                             save_dir="/tmp/prof_dn")
    tr = DenoiseTrainer(cfg)
    gt = jax.random.uniform(jax.random.PRNGKey(0), (16, 128, 128, 3))
    fn = tr._train_step
    state = {"params": tr.params, "opt": tr.opt_state}

    def run(i):
        key = jax.random.PRNGKey(i)
        state["params"], state["opt"], aux = fn(state["params"],
                                                state["opt"], gt, key)
        return aux["loss"]

    lowered = jax.jit(tr._train_step_raw).lower(
        tr.params, tr.opt_state, gt, jax.random.PRNGKey(0))
    return run, lowered


def build_denoise_fwd():
    from virnet_tpu.models import build_model

    model = build_model("denoising-syn")
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (32, 256, 256, 3), jnp.bfloat16)
    params = model.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                                    params)

    @jax.jit
    def fwd(z):
        mu, _ = model.apply({"params": params}, z)
        return mu.astype(jnp.float32).mean()

    def run(i):
        return fwd(x)

    return run, fwd.lower(x)


BUILDERS = {"sisr_train": build_sisr_train,
            "denoise_train": build_denoise_train,
            "denoise_fwd": build_denoise_fwd}


def opname_map(lowered) -> dict:
    """fusion/op result name -> op_name metadata (layer path) from HLO."""
    txt = lowered.compile().as_text()
    out = {}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = .*metadata=\{[^}]*"
                     r"op_name=\"([^\"]+)\"", line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", choices=sorted(BUILDERS), required=True)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", default="/tmp/step_trace")
    args = ap.parse_args()

    run, lowered = BUILDERS[args.which]()
    np.asarray(run(0))  # compile + warm
    np.asarray(run(1))

    with jax.profiler.trace(args.trace_dir):
        for i in range(args.steps):
            v = run(2 + i)
        np.asarray(v)

    tr = sorted(glob.glob(args.trace_dir
                          + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(tr) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and "args" in e}
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "/device" in n.lower()}
    agg = collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and "XLA Ops" in tids.get((e["pid"], e["tid"]), "")):
            agg[e["name"]] += e.get("dur", 0)

    names = opname_map(lowered)
    total = sum(agg.values())
    print(f"device total: {total / 1e3 / args.steps:.3f} ms/step "
          f"over {args.steps} steps\n")
    print(f"{'us/step':>9}  {'%':>5}  op  [layer]")
    for name, dur in agg.most_common(args.top):
        layer = names.get(name.strip("%"), "")
        print(f"{dur / args.steps:9.1f}  {100 * dur / total:5.1f}  "
              f"{name}  [{layer}]")


if __name__ == "__main__":
    main()
