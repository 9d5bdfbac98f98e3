"""Kill/resume bitwise-equivalence proof for the training runtime.

The reference's crash story is a manual restart that reloads weights only
and replays the LR scheduler (train_denoising_syn.py:91-105, 262-268), so
an interrupted run and an uninterrupted run end at *different* optimizer
states.  This framework checkpoints the full train state (params +
optimizer + counters, train/checkpoint.py) and derives every step's
randomness from (seed, epoch, step), so the claim is stronger: a run
SIGKILLed mid-epoch and resumed from the last epoch checkpoint must finish
with BITWISE-identical parameters to a run that was never interrupted.

This harness proves the claim end to end with the production trainer CLI:

  run A:  train --config ...                      (uninterrupted)
  run B:  train --config ...                      (SIGKILL mid-epoch)
          train --config ... --resume latest      (auto-resume relaunch)
  assert: final orbax checkpoints of A and B are leaf-for-leaf bitwise
          equal (params, optimizer state, counters)

Usage (full-scale on-chip proof, ~2x 14 min at 24.6 steps/s):

    python -m virnet_tpu.cli.resilience_proof \
        --config configs/denoising_syn.json --epochs 2 \
        --steps_per_epoch 10000 --work_dir /tmp/resilience \
        --override train_data='[["/path/to/pool","*.png"]]' \
        --override device_data=true

A tiny CPU-mesh version runs in tests/test_resilience_proof.py.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np


def _write_cfg(base: dict, save_dir: Path, path: Path, **extra) -> Path:
    cfg = dict(base)
    cfg.update(extra)
    cfg["save_dir"] = str(save_dir)
    path.write_text(json.dumps(cfg, indent=1))
    return path


def _spawn(cfg_path: Path, *extra_args: str, env=None) -> subprocess.Popen:
    cmd = [sys.executable, "-m", "virnet_tpu.cli.train_denoising_syn",
           "--config", str(cfg_path), *extra_args]
    return subprocess.Popen(cmd, env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT)


def _wait(proc: subprocess.Popen, timeout_s: float) -> int:
    try:
        return proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        raise SystemExit(f"child pid {proc.pid} timed out after "
                         f"{timeout_s:.0f}s")


def _wait_for_marker(log_path: Path, pattern: str, proc: subprocess.Popen,
                     timeout_s: float) -> bool:
    """Poll ``log_path`` until a line matches ``pattern`` (true) or the
    process exits / the timeout passes (false)."""
    rx = re.compile(pattern)
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if log_path.exists():
            for line in log_path.read_text(errors="replace").splitlines():
                if rx.search(line):
                    return True
        if proc.poll() is not None:
            return False
        time.sleep(0.2)
    return False


def _load_final_state(save_dir: Path):
    from ..train.checkpoint import CheckpointManager

    mngr = CheckpointManager(save_dir)
    step = mngr.latest_step()
    if step is None:
        raise RuntimeError(f"no checkpoint under {save_dir}")
    return step, mngr.restore(step)


def compare_states(state_a, state_b):
    """Leaf-for-leaf bitwise comparison; returns (match, n_leaves, report)."""
    import jax

    leaves_a, treedef_a = jax.tree_util.tree_flatten_with_path(state_a)
    leaves_b, treedef_b = jax.tree_util.tree_flatten_with_path(state_b)
    if treedef_a != treedef_b:
        return False, len(leaves_a), ["tree structure differs"]
    bad = []
    for (path_a, a), (_, b) in zip(leaves_a, leaves_b):
        a, b = np.asarray(a), np.asarray(b)
        if a.shape != b.shape or a.dtype != b.dtype or \
                not np.array_equal(a, b, equal_nan=True):
            name = jax.tree_util.keystr(path_a)
            diff = (float(np.max(np.abs(a.astype(np.float64) -
                                        b.astype(np.float64))))
                    if a.shape == b.shape and a.dtype == b.dtype
                    else "shape/dtype")
            bad.append(f"{name}: {diff}")
    return not bad, len(leaves_a), bad


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--steps_per_epoch", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--work_dir", default="/tmp/virnet_resilience")
    p.add_argument("--kill_epoch", type=int, default=None,
                   help="1-based epoch to SIGKILL run B in (default: last)")
    p.add_argument("--kill_step", type=int, default=None,
                   help="step within the epoch whose log marker triggers "
                        "the kill (default: steps_per_epoch // 2, rounded "
                        "to print_freq)")
    p.add_argument("--timeout_s", type=float, default=3600.0,
                   help="per-phase timeout")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform in the child processes "
                        "(e.g. 'cpu' for the test-sized proof)")
    p.add_argument("--override", action="append", default=[],
                   metavar="KEY=JSON", help="config override, value parsed "
                   "as JSON (falls back to raw string)")
    args = p.parse_args(argv)

    if args.platform:
        # Pin the platform in THIS process too, not just the children:
        # the checkpoint comparison below imports orbax/jax, and letting
        # that initialize the default (remote TPU) backend makes the
        # harness hang for many minutes when the relay is unreachable.
        os.environ["VIRNET_TPU_PLATFORM"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ..config import load_config

    base = load_config(args.config)
    base["epochs"] = args.epochs
    base["steps_per_epoch"] = args.steps_per_epoch
    if args.batch_size:
        base["batch_size"] = args.batch_size
    for ov in args.override:
        k, _, v = ov.partition("=")
        try:
            base[k] = json.loads(v)
        except json.JSONDecodeError:
            base[k] = v

    work = Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    dir_a, dir_b = work / "run_a", work / "run_b"
    cfg_a = _write_cfg(base, dir_a, work / "cfg_a.json")
    cfg_b = _write_cfg(base, dir_b, work / "cfg_b.json")

    env = dict(os.environ)
    if args.platform:
        env["VIRNET_TPU_PLATFORM"] = args.platform

    kill_epoch = args.kill_epoch or args.epochs
    print_freq = int(base.get("print_freq", 100))
    kill_step = args.kill_step or args.steps_per_epoch // 2
    kill_step = max(print_freq, (kill_step // print_freq) * print_freq)
    # the trainer's progress-line format (train/loop_denoise.py)
    marker = (rf"\[Epoch:\s*{kill_epoch}/.*train:"
              rf"{kill_step:05d}/{args.steps_per_epoch:05d}")

    t0 = time.monotonic()
    print(f"[resilience] run A (uninterrupted) -> {dir_a}", flush=True)
    proc = _spawn(cfg_a, env=env)
    rc = _wait(proc, args.timeout_s)
    if rc != 0:
        raise SystemExit(f"run A failed rc={rc} (log: {dir_a}/train.log)")
    t_a = time.monotonic() - t0

    print(f"[resilience] run B: will SIGKILL at epoch {kill_epoch} "
          f"step {kill_step}", flush=True)
    proc = _spawn(cfg_b, env=env)
    hit = _wait_for_marker(dir_b / "train.log", marker, proc,
                           args.timeout_s)
    if not hit:
        if proc.poll() is None:
            proc.kill()
        raise SystemExit(
            f"run B never reached the kill marker {marker!r} "
            f"(log: {dir_b}/train.log)")
    proc.kill()                      # SIGKILL: no cleanup, no atexit
    proc.wait()
    from ..train.checkpoint import CheckpointManager

    ckpt_step_at_kill = CheckpointManager(dir_b).latest_step()
    print(f"[resilience] SIGKILLed run B (pid {proc.pid}) with latest "
          f"checkpoint at epoch {ckpt_step_at_kill}; relaunching with "
          f"--resume latest", flush=True)

    proc = _spawn(cfg_b, "--resume", "latest", env=env)
    rc = _wait(proc, args.timeout_s)
    if rc != 0:
        raise SystemExit(f"run B resume failed rc={rc} "
                         f"(log: {dir_b}/train.log)")

    step_a, state_a = _load_final_state(dir_a)
    step_b, state_b = _load_final_state(dir_b)
    match, n_leaves, bad = compare_states(state_a, state_b)
    result = {
        "metric": "resilience_bitwise_resume",
        "match": bool(match and step_a == step_b),
        "final_ckpt_step": [int(step_a), int(step_b)],
        "leaves_compared": int(n_leaves),
        "epochs": args.epochs,
        "steps_per_epoch": args.steps_per_epoch,
        "killed_at": f"epoch {kill_epoch} step {kill_step}",
        "ckpt_step_at_kill": (None if ckpt_step_at_kill is None
                              else int(ckpt_step_at_kill)),
        "run_a_wall_s": round(t_a, 1),
        "mismatched_leaves": bad[:10],
    }
    print(json.dumps(result), flush=True)
    if not result["match"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
