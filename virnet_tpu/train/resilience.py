"""Failure recovery: auto-resume around the epoch loop.

The reference has no failure handling (SURVEY.md §5.3 — crash recovery is a
manual restart with --resume).  Here checkpoints carry the full train state
(train/checkpoint.py), so a crashed run can resume losslessly; this wrapper
automates the retry with bounded restarts and exponential backoff.
"""

from __future__ import annotations

import time
import traceback
from typing import Callable


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
