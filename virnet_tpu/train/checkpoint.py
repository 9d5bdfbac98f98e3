"""Orbax checkpointing: full train state (params + optimizer + counters).

Improves on the reference's weights-only torch.save / scheduler replay
(train_denoising_syn.py:91-105, 262-268) while staying interoperable: the
convert/ package imports the reference's .pth weights into the same param
tree this manager saves.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, save_dir, max_to_keep: int = 5):
        self.dir = Path(save_dir).absolute() / "ckpts"
        self.dir.mkdir(parents=True, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: Dict[str, Any]):
        state = jax.tree_util.tree_map(np.asarray, state)
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def restore(self, step: Optional[int] = None,
                like: Optional[Dict[str, Any]] = None):
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None
        if like is not None:
            like = jax.tree_util.tree_map(np.asarray, like)
            return self.mngr.restore(
                step, args=ocp.args.StandardRestore(like))
        return self.mngr.restore(step)

    def latest_step(self):
        return self.mngr.latest_step()
