"""BaseEngine: output-directory + logging + locked-file persistence + sync.

Capability parity with reference cbench/utils/engine.py:39-212 (per-engine
output dir, named logger, file-lock guarded writes, engine copies for
sub-experiments, optional remote file sync via sync_utils —
reference engine.py:114-155 wires GeneralFileSyncUtils timers the same way).
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

    def __init__(self, output_dir: str | None = None, logger=None,
                 sync_utils=None, sync_remote_dir: str | None = None,
                 **kwargs):
        self.output_dir = output_dir
        self._logger = logger
        self.profiler = MetricLogger()
        # Optional experiment-dir sync (utils/sync_utils.py). The remote
        # directory defaults to mirroring output_dir's relative layout.
        self.sync_utils = sync_utils
        self.sync_remote_dir = sync_remote_dir
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

    # -- optional remote sync (parity: engine.py:114-155) ------------------
    def _sync_target(self) -> str:
        if self.sync_remote_dir is not None:
            return self.sync_remote_dir
        if self.output_dir is None:
            raise ValueError("engine has no output_dir to sync")
        return os.path.basename(os.path.normpath(self.output_dir))

    def sync_now(self) -> int:
        """One upload pass of the whole output dir; returns files moved."""
        if self.sync_utils is None or self.output_dir is None:
            return 0
        return self.sync_utils.upload_directory(self._sync_target(),
                                                self.output_dir)

    def start_periodic_sync(self, interval: float = 600.0):
        """Background timer uploading new/changed artifacts every
        `interval` seconds. No-op without sync_utils."""
        if self.sync_utils is None or self.output_dir is None:
            return None
        return self.sync_utils.register_timer(self.sync_now, interval)

    def stop_sync(self):
        """Final upload pass, then stop the timers."""
        if self.sync_utils is None:
            return
        try:
            self.sync_now()
        finally:
            self.sync_utils.stop_all_timers()
