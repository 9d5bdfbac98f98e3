"""Failure recovery: auto-resume around the epoch loop + RSS watchdog.

The reference has no failure handling (SURVEY.md §5.3 — crash recovery is a
manual restart with --resume).  Here checkpoints carry the full train state
(train/checkpoint.py), so a crashed run can resume losslessly; this wrapper
automates the retry with bounded restarts and exponential backoff.

The RSS watchdog bounds the one memory-growth source the round-5 audit
(BASELINE.md "round-5 bounded-memory audit") could not eliminate in-process:
the image's TPU relay client grows host RSS ~2.5 GB/h during training
dispatches, non-Python and immune to malloc_trim, while every repo subsystem
(TB, orbax, validation, jit caches, device-resident data) measures flat.
Because kill/resume is proven BITWISE (cli/resilience_proof.py), replacing
the process image at an epoch boundary is free — so the bound is: checkpoint
synchronously (the trainers already do), then ``os.execv`` ourselves with
``--resume latest`` once RSS crosses the configured limit.  Training
continues from the identical optimizer state with a fresh heap.
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from typing import Callable, List, Optional, Sequence

_RSS_RESTART_ENV = "VIRNET_TPU_RSS_RESTARTS"


def rss_mb() -> float:
    """Current resident set size in MB from /proc (0.0 if unavailable)."""
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return float(line.split()[1]) / 1024.0
    except (OSError, ValueError, IndexError):
        pass
    return 0.0


def rss_restart_count() -> int:
    """How many RSS-triggered re-execs this lineage has performed."""
    try:
        return int(os.environ.get(_RSS_RESTART_ENV, "0"))
    except ValueError:
        return 0


def reexec_argv(module: str, argv: Optional[Sequence[str]] = None
                ) -> List[str]:
    """Build the ``os.execv`` argv that relaunches a trainer CLI.

    Reuses the process's own interpreter and CLI arguments, forcing
    ``--resume latest`` so the relaunch restores the checkpoint the caller
    just wrote (idempotent if the user already passed --resume).
    """
    args = list(sys.argv[1:] if argv is None else argv)
    if "--resume" not in args:
        args += ["--resume", "latest"]
    return [sys.executable, "-m", module, *args]


def maybe_reexec_on_rss(limit_mb: float, exec_argv: Sequence[str],
                        log_fn=print, cleanup: Optional[Callable] = None,
                        _exec=None, _rss=None) -> bool:
    """Re-exec the process when RSS exceeds ``limit_mb`` (<=0 disables).

    Call immediately AFTER the epoch checkpoint is saved (orbax save is
    synchronous, train/checkpoint.py:32).  Either returns False (below the
    limit / disabled) or replaces the process image and never returns.
    ``cleanup`` runs before exec (flush TensorBoard, close files).  The
    restart count is carried across exec in the environment so logs show
    the lineage.  ``_exec``/``_rss`` are test seams.
    """
    if not limit_mb or limit_mb <= 0:
        return False
    cur = float(_rss() if _rss is not None else rss_mb())
    if cur < limit_mb:
        return False
    n = rss_restart_count() + 1
    os.environ[_RSS_RESTART_ENV] = str(n)
    log_fn(f"RSS watchdog: {cur:.0f} MB >= limit {limit_mb:.0f} MB — "
           f"re-exec #{n} with --resume latest (kill/resume is bitwise; "
           f"see BASELINE.md round-5 bounded-memory audit)")
    if cleanup is not None:
        try:
            cleanup()
        except Exception:
            log_fn("RSS watchdog: cleanup raised\n" + traceback.format_exc())
    sys.stdout.flush()
    sys.stderr.flush()
    (_exec if _exec is not None else os.execv)(exec_argv[0], list(exec_argv))
    return True  # only reachable with a test seam _exec


def run_with_auto_resume(train_fn: Callable[[int], None],
                         restore_fn: Callable[[], int],
                         max_restarts: int = 3,
                         backoff_s: float = 10.0,
                         log_fn=print) -> None:
    """Run ``train_fn(epoch_start)`` with automatic resume on failure.

    restore_fn() -> epoch to resume from (0 if no checkpoint).
    Reraises after ``max_restarts`` consecutive failures.
    """
    restarts = 0
    while True:
        epoch_start = restore_fn()
        try:
            train_fn(epoch_start)
            return
        except KeyboardInterrupt:
            raise
        except Exception:
            restarts += 1
            log_fn(f"training crashed (restart {restarts}/{max_restarts}):\n"
                   f"{traceback.format_exc()}")
            if restarts > max_restarts:
                raise
            time.sleep(backoff_s * restarts)
