"""Dual-sink logging (stderr + experiment.log), process-tagged.

Parity with the reference logger (src/main.py:22-45): DEBUG level, an
``asctime - message`` format, optional per-process tag (the reference's
per-rank formatter, src/main.py:30-31 — here keyed on jax.process_index()).
"""

from __future__ import annotations

import logging
import sys
from typing import Optional


def get_logger(path: Optional[str] = None,
               process: Optional[int] = None) -> logging.Logger:
    name = "vlg_tpu" if process is None else f"vlg_tpu.p{process}"
    logger = logging.getLogger(name)
    if logger.handlers:          # idempotent
        return logger
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if process is None:
        fmt = logging.Formatter("%(asctime)s-%(message)s")
    else:
        fmt = logging.Formatter(
            f"%(asctime)s - [proc {process}] - %(message)s")

    sh = logging.StreamHandler(sys.stderr)
    sh.setLevel(logging.DEBUG)
    sh.setFormatter(fmt)
    logger.addHandler(sh)

    if path is not None:
        fh = logging.FileHandler(path)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
