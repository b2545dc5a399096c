"""Logging setup (reference ``utils/misc.py:623-658``): process 0 logs INFO
to stdout + LOGDIR/log.txt, other processes ERROR-only."""

from __future__ import annotations

import logging
import os
import subprocess
import sys


def setup_logger(cfg) -> logging.Logger:
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    is_master = getattr(cfg, "RANK", 0) == 0
    level = logging.INFO if is_master else logging.ERROR
    root.setLevel(level)
    fmt = logging.Formatter(
        "[%(asctime)s][%(levelname)s] %(name)s: %(message)s", "%m/%d %H:%M:%S"
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    root.addHandler(sh)
    if is_master and getattr(cfg, "LOGDIR", None):
        os.makedirs(cfg.LOGDIR, exist_ok=True)
        fh = logging.FileHandler(os.path.join(cfg.LOGDIR, "log.txt"))
        fh.setFormatter(fmt)
        root.addHandler(fh)
    return root


def get_commit_sha() -> str:
    """(reference tools/run.py:69-74)."""
    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL
            )
            .decode()
            .strip()
        )
    except Exception:
        return "unknown"
