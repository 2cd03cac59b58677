"""Logging + scalar metrics (reference: ISBNet/isbnet/util/logger.py).

The reference pairs a rank-0-gated python logger with a tensorboardX
SummaryWriter (:8-38). Here: same rank gating via jax.process_index(), and a
dependency-free JSONL scalar writer (loadable into pandas/tensorboard
offline). An AverageMeter matches util/utils.py:25-33 semantics.
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import time
from typing import Optional


def is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def get_logger(name: str = "gapro_tpu", log_file: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO if is_main_process() else logging.WARNING)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file and is_main_process():
        os.makedirs(osp.dirname(osp.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class ScalarWriter:
    """JSONL scalar stream; every record: {step, tag, value, wall}."""

    def __init__(self, log_dir: str):
        self._f = None
        if is_main_process():
            os.makedirs(log_dir, exist_ok=True)
            self._f = open(osp.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value, step: int):
        if self._f is None:
            return
        self._f.write(json.dumps(dict(step=int(step), tag=tag,
                                      value=float(value), wall=time.time())) + "\n")
        self._f.flush()

    def close(self):
        if self._f is not None:
            self._f.close()


class AverageMeter:
    """Running average (util/utils.py:10-33)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
