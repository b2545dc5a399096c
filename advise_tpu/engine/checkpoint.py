"""Checkpointing: periodic + best + auto-resume.

Reference: ``utils/misc.py:226-349`` (``checkpoint_manager``),
``utils/misc.py:62-164`` (resume/init). Same file naming
(``Model_Epoch_%04d``, ``Model_Best``), SAVE_FREQ / best-criteria policy
and newest-epoch auto-resume; serialization is Orbax (the JAX-native
checkpointer) over the full functional state {params, batch_stats,
opt_state, ssl buffers, step} — which, unlike the reference, also makes
EMA/queue state restartable.
"""

from __future__ import annotations

import logging
import os
import re
import shutil
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, cfg, criteria_fn: Optional[Callable] = None):
        self.cfg = cfg
        self.dir = os.path.abspath(os.path.join(cfg.LOGDIR, "checkpoints"))
        self.save_freq = cfg.TRAIN.SAVE_FREQ
        self.criteria_fn = criteria_fn or (lambda summary: summary.get("loss_spd", summary.get("loss_cls", 0.0)))
        self.best = float("inf")
        self._ckptr = ocp.StandardCheckpointer()
        if jax.process_index() == 0:
            os.makedirs(self.dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, name)

    def save(self, state, epoch: int, summary: Dict[str, float]):
        """rank-0 style save: periodic + best (reference misc.py:280-349)."""
        if jax.process_index() != 0:
            return
        meta = {"epoch": epoch, "summary": dict(summary)}
        if (epoch + 1) % self.save_freq == 0 or epoch + 1 == self.cfg.SOLVER.MAX_EPOCH:
            p = self._path(f"Model_Epoch_{epoch:04d}")
            self._save_at(p, state, meta)
            logger.info("checkpoint saved: %s", p)
        crit = self.criteria_fn(summary)
        if crit < self.best:
            self.best = crit
            p = self._path("Model_Best")
            self._save_at(p, state, meta)
            logger.info("best checkpoint updated (criteria %.4f): %s", crit, p)

    def _save_at(self, path: str, state, meta: Dict):
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        np.save(path + ".meta.npy", np.array([meta], dtype=object))

    def get_last_checkpoint(self) -> Optional[Tuple[str, int]]:
        """Newest Model_Epoch_* (reference misc.py:258-278)."""
        if not os.path.isdir(self.dir):
            return None
        best_ep, best_path = -1, None
        for name in os.listdir(self.dir):
            m = re.fullmatch(r"Model_Epoch_(\d{4})", name)
            if m and int(m.group(1)) > best_ep:
                best_ep, best_path = int(m.group(1)), self._path(name)
        return (best_path, best_ep) if best_path else None

    def restore(self, path: str, target):
        """Restore a state pytree of the same structure as `target`."""
        return self._ckptr.restore(path, target=target)


def auto_resume(cfg, manager: CheckpointManager, state):
    """TRAIN.AUTO_RESUME / explicit TRAIN.RESUME (reference
    tools/train.py:317-319, utils/misc.py:86-164). Returns
    (state, start_epoch)."""
    path, epoch = None, -1
    if cfg.TRAIN.RESUME:
        path = cfg.TRAIN.RESUME
        m = re.search(r"Model_Epoch_(\d{4})", path)
        epoch = int(m.group(1)) if m else -1
    elif cfg.TRAIN.AUTO_RESUME:
        last = manager.get_last_checkpoint()
        if last:
            path, epoch = last
    if path is None:
        return state, cfg.SOLVER.START_EPOCH
    logger.info("resuming from %s (epoch %d)", path, epoch)
    state = manager.restore(path, state)
    return state, epoch + 1
