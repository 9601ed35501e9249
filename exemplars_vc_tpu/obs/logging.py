"""Structured logging + run-directory management.

Replaces the reference's per-script ``logging.basicConfig`` into timestamped
files (``01_make_dict_parallel.py:41-52``) and the integer run-dir allocator
``logdir()`` (``utils.py:27-49``)."""

from __future__ import annotations

import logging
import os
import sys
import time

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def get_logger(name: str = "exemplars_vc_tpu", log_dir: str | None = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(
            os.path.join(log_dir, time.strftime("%Y-%m-%d_%H-%M-%S.log"))
        )
        fh.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def new_run_dir(root: str = "runs") -> str:
    """Allocate the next integer-numbered run directory (reference
    ``utils.py:27-49`` semantics), creating it atomically."""
    os.makedirs(root, exist_ok=True)
    existing = [int(d) for d in os.listdir(root) if d.isdigit()]
    n = max(existing, default=-1) + 1
    while True:
        path = os.path.join(root, str(n))
        try:
            os.mkdir(path)
            return path
        except FileExistsError:
            n += 1
