"""BaseEngine: output-directory + logging + locked-file persistence.

Capability parity with reference cbench/utils/engine.py:39-212 (per-engine
output dir, named logger, file-lock guarded writes, engine copies for
sub-experiments); remote sync backends are intentionally out of scope for
the TPU rebuild (single-host artifact directory + external rsync).
"""

from __future__ import annotations

import copy
import fcntl
import os
from contextlib import contextmanager
from pathlib import Path

from .logging_utils import MetricLogger, setup_logger


@contextmanager
def locked_file(path: str | Path, mode: str = "wb"):
    """Exclusive-lock file writes so concurrent workers don't interleave
    (parity: FileWriteLocker, engine.py:8-36)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    lock_path = path.with_suffix(path.suffix + ".lock")
    with open(lock_path, "w") as lock_f:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        try:
            with open(path, mode) as f:
                yield f
        finally:
            fcntl.flock(lock_f, fcntl.LOCK_UN)


class BaseEngine:
    """Anything that owns an output directory and a logger."""

    def __init__(self, output_dir: str | None = None, logger=None, **kwargs):
        self.output_dir = output_dir
        self._logger = logger
        self.profiler = MetricLogger()
        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)

    @property
    def logger(self):
        if self._logger is None:
            log_file = (os.path.join(self.output_dir, "engine.log")
                        if self.output_dir else None)
            self._logger = setup_logger(type(self).__name__, log_file)
        return self._logger

    def setup_engine(self, output_dir: str | None = None, logger=None, **kwargs):
        if output_dir is not None:
            self.output_dir = output_dir
            os.makedirs(output_dir, exist_ok=True)
        if logger is not None:
            self._logger = logger

    def setup_engine_from_copy(self, **kwargs) -> "BaseEngine":
        new = copy.copy(self)
        new.setup_engine(**kwargs)
        return new

    def output_path(self, *names: str) -> str:
        if self.output_dir is None:
            raise ValueError("engine has no output_dir")
        return os.path.join(self.output_dir, *names)
