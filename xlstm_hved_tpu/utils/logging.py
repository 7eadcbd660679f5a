"""Logging/observability: CSV metric logs, running averages, stream logger
(re-design of /root/reference/train.py:101-107,411-415 and
utils.py:429-468), plus jax.profiler trace hooks (the reference has only
wall-clock prints, SURVEY.md §5)."""
from __future__ import annotations

import contextlib
import csv
import logging
import os
import sys
import time
from typing import Dict, Iterable, Optional


def get_logger(name: str, level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        logger.setLevel(level)
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(
            "%(asctime)s [%(threadName)s] %(levelname)s %(name)s - %(message)s"))
        logger.addHandler(h)
    return logger


class RunningAverage:
    """Incremental mean (reference RunningAverage, utils.py:456-468)."""

    def __init__(self):
        self.count = 0
        self.sum = 0.0

    def update(self, value: float, n: int = 1):
        self.count += n
        self.sum += float(value) * n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class CSVLogger:
    """Append-style CSV metric log with a fixed header
    (reference train.py:101-107,411-415)."""

    def __init__(self, path: str, fieldnames: Iterable[str]):
        self.path = path
        self.fieldnames = list(fieldnames)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if not os.path.exists(path):
            with open(path, "w", newline="") as f:
                csv.writer(f).writerow(self.fieldnames)

    def append(self, row: Dict[str, float]):
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(
                [row.get(k, "") for k in self.fieldnames])


@contextlib.contextmanager
def step_timer(label: str, logger: Optional[logging.Logger] = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    msg = f"{label}: {dt:.3f}s"
    (logger.info if logger else print)(msg)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
