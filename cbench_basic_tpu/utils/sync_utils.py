"""Experiment-directory file sync: disk / SSH / object-store backends.

Capability parity with reference cbench/utils/sync_utils.py:57-592
(FileSyncUtilsInterface + Disk/SSH/OSS implementations, checksum-guarded
upload/download, directory diff/sync, periodic background timers wired
through BaseEngine). Fresh design for the TPU rebuild:

- one `FileSyncUtils` engine holding a pluggable `SyncBackend` (the
  reference subclasses the whole utils class per backend);
- checksums are crc32 (cheap, matches the reference's CRC use) computed
  streaming, never loading whole checkpoints into memory;
- remote transports that need network binaries (`ssh`/`scp`, or an
  object-store CLI like gsutil/ossutil) are subprocess-driven and fail
  with a clear error when the binary is absent — a zero-egress test
  environment exercises them through an injectable command runner.

Typical wiring (mirrors the reference's BaseEngine integration):

    sync = FileSyncUtils(DiskSyncBackend("/mnt/share/experiments"))
    engine = SomeEngine(output_dir=..., sync_utils=sync)
    engine.start_periodic_sync(interval=600)   # background upload timer
    ...
    engine.stop_sync()                         # flush + stop on shutdown
"""

from __future__ import annotations

import os
import shlex
import shutil
import subprocess
import threading
import zlib
from pathlib import Path
from typing import Callable, Iterator, List, Optional, Tuple


def _crc32_file(path: str | Path, chunk: int = 1 << 20) -> int:
    value = 0
    with open(path, "rb") as f:
        while True:
            block = f.read(chunk)
            if not block:
                return value
            value = zlib.crc32(block, value)


class SyncBackend:
    """Remote-side primitives; local side is always the host filesystem."""

    def exists(self, remote_path: str) -> bool:
        raise NotImplementedError

    def delete(self, remote_path: str) -> None:
        raise NotImplementedError

    def checksum(self, remote_path: str) -> Optional[int]:
        """crc32 of the remote file, or None if the backend can't compute
        one (callers then fall back to size comparison or plain overwrite)."""
        raise NotImplementedError

    def iter_dir(self, remote_dir: str) -> Iterator[str]:
        """Yield file paths under remote_dir, relative to it (POSIX slashes)."""
        raise NotImplementedError

    def upload(self, local_path: str, remote_path: str) -> None:
        raise NotImplementedError

    def download(self, remote_path: str, local_path: str) -> None:
        raise NotImplementedError


class DiskSyncBackend(SyncBackend):
    """Remote = another mounted directory (NFS share, fuse mount, ...)."""

    def __init__(self, root: str | Path = ""):
        self.root = str(root)

    def _abs(self, p: str) -> str:
        return os.path.join(self.root, p) if self.root else p

    def exists(self, remote_path: str) -> bool:
        return os.path.exists(self._abs(remote_path))

    def delete(self, remote_path: str) -> None:
        os.remove(self._abs(remote_path))

    def checksum(self, remote_path: str) -> Optional[int]:
        return _crc32_file(self._abs(remote_path))

    def iter_dir(self, remote_dir: str) -> Iterator[str]:
        base = Path(self._abs(remote_dir))
        if not base.is_dir():
            return
        for p in sorted(base.rglob("*")):
            if p.is_file():
                yield p.relative_to(base).as_posix()

    def upload(self, local_path: str, remote_path: str) -> None:
        dst = self._abs(remote_path)
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        shutil.copy2(local_path, dst)

    def download(self, remote_path: str, local_path: str) -> None:
        os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        shutil.copy2(self._abs(remote_path), local_path)


def _default_runner(cmd: List[str]) -> str:
    """Run a transport command, returning stdout; raises on failure with
    the command line in the message (so missing binaries diagnose cleanly)."""
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
    except FileNotFoundError as e:
        raise RuntimeError(
            f"sync transport binary not available: {cmd[0]!r} "
            f"(install it or use DiskSyncBackend)") from e
    except subprocess.CalledProcessError as e:
        raise RuntimeError(
            f"sync command failed ({' '.join(cmd)}): {e.stderr.strip()}") from e
    return proc.stdout


class SSHSyncBackend(SyncBackend):
    """Remote = `user@host:base_dir` over ssh/scp subprocesses.

    runner is injectable for tests (and for substituting rsync-over-ssh
    in bandwidth-sensitive deployments).
    """

    def __init__(self, host: str, base_dir: str = "",
                 ssh_args: Tuple[str, ...] = (),
                 runner: Callable[[List[str]], str] = _default_runner):
        self.host = host
        self.base_dir = base_dir.rstrip("/")
        self.ssh_args = list(ssh_args)
        self.run = runner

    def _abs(self, p: str) -> str:
        return f"{self.base_dir}/{p}" if self.base_dir else p

    def _ssh(self, command: str) -> str:
        return self.run(["ssh", *self.ssh_args, self.host, command])

    def exists(self, remote_path: str) -> bool:
        q = shlex.quote(self._abs(remote_path))
        out = self._ssh(f"test -e {q} && echo 1 || echo 0")
        return out.strip().endswith("1")

    def delete(self, remote_path: str) -> None:
        self._ssh(f"rm -f {shlex.quote(self._abs(remote_path))}")

    def checksum(self, remote_path: str) -> Optional[int]:
        # cksum's CRC differs from crc32; use python on the remote when
        # available, else fall back to None (size-based comparison).
        # The path rides inside a python literal inside a shell string:
        # shell-quote the whole one-liner, python-quote the path via repr.
        inner = ("import sys,zlib;print(zlib.crc32("
                 f"open({self._abs(remote_path)!r},'rb').read()))")
        out = self._ssh(
            f"python3 -c {shlex.quote(inner)} 2>/dev/null || echo none")
        out = out.strip()
        return None if out == "none" or not out.isdigit() else int(out)

    def iter_dir(self, remote_dir: str) -> Iterator[str]:
        base = self._abs(remote_dir)
        out = self._ssh(f"find {shlex.quote(base)} -type f 2>/dev/null || true")
        prefix = base.rstrip("/") + "/"
        for line in out.splitlines():
            line = line.strip()
            if line.startswith(prefix):
                yield line[len(prefix):]

    def upload(self, local_path: str, remote_path: str) -> None:
        dst = self._abs(remote_path)
        self._ssh(f"mkdir -p {shlex.quote(os.path.dirname(dst))}")
        self.run(["scp", "-q", *self.ssh_args, local_path,
                  f"{self.host}:{dst}"])

    def download(self, remote_path: str, local_path: str) -> None:
        os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        self.run(["scp", "-q", *self.ssh_args,
                  f"{self.host}:{self._abs(remote_path)}", local_path])


class ObjectStoreSyncBackend(SyncBackend):
    """Remote = an object store driven by its CLI (gsutil / ossutil /
    `aws s3` ...). Equivalent of the reference's Aliyun-OSS backend
    without binding to one vendor SDK: the four verbs map onto the
    conventional `<cli> cp/rm/ls` surface and the URL scheme prefix.

    cli: argv prefix, e.g. ("gsutil",) or ("aws", "s3").
    bucket_url: e.g. "gs://my-bucket/experiments".
    """

    def __init__(self, bucket_url: str, cli: Tuple[str, ...] = ("gsutil",),
                 runner: Callable[[List[str]], str] = _default_runner):
        self.bucket_url = bucket_url.rstrip("/")
        self.cli = list(cli)
        self.run = runner

    def _url(self, p: str) -> str:
        return f"{self.bucket_url}/{p}"

    def exists(self, remote_path: str) -> bool:
        try:
            out = self.run([*self.cli, "ls", self._url(remote_path)])
        except RuntimeError:
            return False
        return bool(out.strip())

    def delete(self, remote_path: str) -> None:
        self.run([*self.cli, "rm", self._url(remote_path)])

    def checksum(self, remote_path: str) -> Optional[int]:
        return None  # store-side hashes are not crc32; use size/overwrite

    def iter_dir(self, remote_dir: str) -> Iterator[str]:
        url = self._url(remote_dir).rstrip("/") + "/"
        try:
            out = self.run([*self.cli, "ls", "-r", url])
        except RuntimeError:
            return
        for line in out.splitlines():
            line = line.strip()
            if line.startswith(url) and not line.endswith("/"):
                yield line[len(url):]

    def upload(self, local_path: str, remote_path: str) -> None:
        self.run([*self.cli, "cp", local_path, self._url(remote_path)])

    def download(self, remote_path: str, local_path: str) -> None:
        os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        self.run([*self.cli, "cp", self._url(remote_path), local_path])


class _RepeatingTimer(threading.Thread):
    """Daemon thread running fn every `interval` seconds until stopped
    (reference FileSyncObject, sync_utils.py:25-54)."""

    def __init__(self, fn, interval: float, loop: bool = True, logger=None):
        super().__init__(daemon=True)
        self.fn = fn
        self.interval = interval
        self.loop = loop
        self.logger = logger
        self._stop_evt = threading.Event()

    def request_exit(self):
        self._stop_evt.set()

    def run(self):
        while not self._stop_evt.wait(self.interval):
            try:
                self.fn()
            except Exception as e:  # timers must never kill the process
                if self.logger is not None:
                    self.logger.warning(f"periodic sync failed: {e}")
            if not self.loop:
                return


class FileSyncUtils:
    """Checksum-guarded file/directory synchronisation over a backend."""

    def __init__(self, backend: SyncBackend, logger=None):
        self.backend = backend
        self.logger = logger
        self._timers: List[_RepeatingTimer] = []

    # -- single files -----------------------------------------------------
    def _same(self, remote_path: str, local_path: str) -> bool:
        remote_crc = self.backend.checksum(remote_path)
        if remote_crc is None:
            return False
        return remote_crc == _crc32_file(local_path)

    def upload(self, remote_path: str, local_path: str, *,
               checksum: bool = True, allow_overwrite: bool = True) -> bool:
        """Returns True if bytes moved (False = skipped as identical)."""
        if self.backend.exists(remote_path):
            if checksum and self._same(remote_path, local_path):
                return False
            if not allow_overwrite:
                raise FileExistsError(f"remote exists: {remote_path}")
        self.backend.upload(local_path, remote_path)
        if checksum and not self._same(remote_path, local_path) \
                and self.backend.checksum(remote_path) is not None:
            raise IOError(f"checksum mismatch after upload: {remote_path}")
        return True

    def download(self, remote_path: str, local_path: str, *,
                 checksum: bool = True, allow_overwrite: bool = True) -> bool:
        if os.path.exists(local_path):
            if checksum and self._same(remote_path, local_path):
                return False
            if not allow_overwrite:
                raise FileExistsError(f"local exists: {local_path}")
        self.backend.download(remote_path, local_path)
        return True

    # -- directories ------------------------------------------------------
    @staticmethod
    def _iter_local(local_dir: str) -> Iterator[str]:
        base = Path(local_dir)
        if not base.is_dir():
            return
        for p in sorted(base.rglob("*")):
            if p.is_file() and not p.name.endswith(".lock"):
                yield p.relative_to(base).as_posix()

    def diff_directory(self, remote_dir: str, local_dir: str):
        """(local_only, remote_only, both) relative paths."""
        local = set(self._iter_local(local_dir))
        remote = set(self.backend.iter_dir(remote_dir))
        return sorted(local - remote), sorted(remote - local), sorted(local & remote)

    def upload_directory(self, remote_dir: str, local_dir: str, *,
                         checksum: bool = True, delete_extra: bool = False) -> int:
        moved = 0
        local_only, remote_only, both = self.diff_directory(remote_dir, local_dir)
        for rel in local_only + both:
            moved += self.upload(f"{remote_dir}/{rel}",
                                 os.path.join(local_dir, rel),
                                 checksum=checksum)
        if delete_extra:
            for rel in remote_only:
                self.backend.delete(f"{remote_dir}/{rel}")
        return moved

    def download_directory(self, remote_dir: str, local_dir: str, *,
                           checksum: bool = True) -> int:
        moved = 0
        for rel in self.backend.iter_dir(remote_dir):
            moved += self.download(f"{remote_dir}/{rel}",
                                   os.path.join(local_dir, rel),
                                   checksum=checksum)
        return moved

    def sync_file(self, remote_path: str, local_path: str) -> str:
        """Copy whichever side exists to the side that doesn't ('up',
        'down', or 'none'); both-exist resolves to upload (local wins,
        matching the reference's experiment-artifact direction)."""
        has_local = os.path.exists(local_path)
        has_remote = self.backend.exists(remote_path)
        if has_local:
            return "up" if self.upload(remote_path, local_path) else "none"
        if has_remote:
            self.download(remote_path, local_path)
            return "down"
        return "none"

    def sync_directory(self, remote_dir: str, local_dir: str) -> Tuple[int, int]:
        """Two-way merge: local-only files go up, remote-only come down,
        shared paths resolve local-wins. Returns (uploaded, downloaded)."""
        local_only, remote_only, both = self.diff_directory(remote_dir, local_dir)
        up = down = 0
        for rel in local_only + both:
            up += self.upload(f"{remote_dir}/{rel}",
                              os.path.join(local_dir, rel))
        for rel in remote_only:
            down += self.download(f"{remote_dir}/{rel}",
                                  os.path.join(local_dir, rel))
        return up, down

    # -- timers -------------------------------------------------------------
    def register_timer(self, fn: Callable[[], None], interval: float = 600.0,
                       loop: bool = True) -> _RepeatingTimer:
        t = _RepeatingTimer(fn, interval, loop=loop, logger=self.logger)
        self._timers.append(t)
        t.start()
        return t

    def stop_all_timers(self):
        for t in self._timers:
            t.request_exit()
        for t in self._timers:
            t.join(timeout=5.0)
        self._timers.clear()
