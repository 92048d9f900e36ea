"""Metric logging and profiling utilities.

Capability parity with reference cbench/utils/logging_utils.py:18-155
(SmoothedValue window/global averages, MetricLogger dict of smoothed values,
scoped time profiler) in a leaner form.
"""

from __future__ import annotations

import logging
import sys
import time
from collections import defaultdict, deque
from contextlib import contextmanager
from typing import Dict


def setup_logger(name: str, output_file: str | None = None,
                 level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter("[%(asctime)s %(name)s %(levelname)s] %(message)s"))
        logger.addHandler(h)
    if output_file is not None:
        fh = logging.FileHandler(output_file)
        fh.setFormatter(logging.Formatter("[%(asctime)s %(levelname)s] %(message)s"))
        logger.addHandler(fh)
    return logger


class SmoothedValue:
    """Tracks a windowed median/average and global average of a series."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, max=self.max,
                               value=self.value)


class MetricLogger:
    """Dict of SmoothedValues plus scoped wall-time profiling."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            if hasattr(v, "item"):
                v = v.item()
            self.meters[k].update(v)

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{k}: {v}" for k, v in self.meters.items())

    def get_global_average(self) -> Dict[str, float]:
        return {k: v.global_avg for k, v in self.meters.items()}

    def clear(self):
        self.meters.clear()

    @contextmanager
    def start_time_profile(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.update(**{name: time.perf_counter() - start})

    def log_every(self, iterable, print_freq: int, logger=None, header: str = ""):
        i = 0
        start = time.time()
        for obj in iterable:
            yield obj
            i += 1
            if i % print_freq == 0 and logger is not None:
                logger.info(f"{header} [{i}] {self} ({time.time() - start:.1f}s)")


class TimeProfiler:
    """Standalone scoped timer collecting named durations."""

    def __init__(self):
        self.results: Dict[str, list] = defaultdict(list)

    @contextmanager
    def profile(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.results[name].append(time.perf_counter() - start)

    def total(self, name: str) -> float:
        return sum(self.results.get(name, []))

    def clear(self):
        self.results.clear()
