"""Logging + TensorBoard setup.

Behavioral reference: `logger.py:12-31` (stdout + log.txt file handler) and
`main.py:84-90` (SummaryWriter into the experiment dir). TensorBoard scalars
keep the reference's tag names (Loss/{key}, Loss/loss_sum, TrainPsnr, LR,
Val/*; `trainer.py:86-91,159-160`).
"""

from __future__ import annotations

import logging
import os
import sys


def setup_logger(name: str, save_dir: str, filename: str = "log.txt"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger

    formatter = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setLevel(logging.DEBUG)
    ch.setFormatter(formatter)
    logger.addHandler(ch)

    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(save_dir, filename))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def make_summary_writer(log_dir: str):
    """TensorBoard writer; no-op fallback if tensorboardX is unavailable."""
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir=log_dir, max_queue=1)
    except Exception:

        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def add_text(self, *a, **k):
                pass

            def close(self):
                pass

        return _Null()
