"""File-sync utils: disk backend round-trips, checksum guards, directory
diff/sync, periodic timers, engine wiring, and the subprocess transports
(SSH / object-store CLI) through an injected fake command runner.

Parity surface: reference cbench/utils/sync_utils.py:57-592 + its
BaseEngine wiring (engine.py:114-155).
"""
import os
import threading
import time

import pytest

from cbench_basic_tpu.utils.engine import BaseEngine
from cbench_basic_tpu.utils.sync_utils import (
    DiskSyncBackend,
    FileSyncUtils,
    ObjectStoreSyncBackend,
    SSHSyncBackend,
    _crc32_file,
)


def _write(path, data: bytes):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)


@pytest.fixture
def disk_sync(tmp_path):
    remote = tmp_path / "remote"
    local = tmp_path / "local"
    remote.mkdir()
    local.mkdir()
    return FileSyncUtils(DiskSyncBackend(str(remote))), str(remote), str(local)


def test_upload_download_roundtrip(disk_sync):
    sync, remote, local = disk_sync
    src = os.path.join(local, "a", "params.pkl")
    _write(src, b"checkpoint-bytes")
    assert sync.upload("exp/a/params.pkl", src) is True
    assert os.path.exists(os.path.join(remote, "exp/a/params.pkl"))
    dst = os.path.join(local, "restored.pkl")
    assert sync.download("exp/a/params.pkl", dst) is True
    with open(dst, "rb") as f:
        assert f.read() == b"checkpoint-bytes"


def test_upload_skips_identical_and_guards_overwrite(disk_sync):
    sync, remote, local = disk_sync
    src = os.path.join(local, "m.csv")
    _write(src, b"metrics")
    assert sync.upload("m.csv", src) is True
    # identical content -> checksum short-circuits, no byte movement
    assert sync.upload("m.csv", src) is False
    _write(src, b"metrics-v2")
    with pytest.raises(FileExistsError):
        sync.upload("m.csv", src, allow_overwrite=False)
    assert sync.upload("m.csv", src) is True  # overwrite allowed by default
    assert _crc32_file(os.path.join(remote, "m.csv")) == _crc32_file(src)


def test_directory_diff_and_two_way_sync(disk_sync):
    sync, remote, local = disk_sync
    _write(os.path.join(local, "exp", "metrics.csv"), b"local-only")
    _write(os.path.join(local, "exp", "shared.txt"), b"local-version")
    _write(os.path.join(remote, "run", "shared.txt"), b"remote-version")
    _write(os.path.join(remote, "run", "old_ckpt.pkl"), b"remote-only")

    local_only, remote_only, both = sync.diff_directory(
        "run", os.path.join(local, "exp"))
    assert local_only == ["metrics.csv"]
    assert remote_only == ["old_ckpt.pkl"]
    assert both == ["shared.txt"]

    up, down = sync.sync_directory("run", os.path.join(local, "exp"))
    assert (up, down) == (2, 1)  # metrics + shared(local wins) up, ckpt down
    with open(os.path.join(remote, "run", "shared.txt"), "rb") as f:
        assert f.read() == b"local-version"  # local wins on conflict
    assert os.path.exists(os.path.join(local, "exp", "old_ckpt.pkl"))


def test_sync_file_directions(disk_sync):
    sync, remote, local = disk_sync
    lp = os.path.join(local, "f.bin")
    assert sync.sync_file("f.bin", lp) == "none"
    _write(os.path.join(remote, "f.bin"), b"remote")
    assert sync.sync_file("f.bin", lp) == "down"
    assert sync.sync_file("f.bin", lp) == "none"  # identical now
    _write(lp, b"newer-local")
    assert sync.sync_file("f.bin", lp) == "up"


def test_lock_files_excluded_from_directory_upload(disk_sync):
    sync, remote, local = disk_sync
    _write(os.path.join(local, "metrics.csv"), b"x")
    _write(os.path.join(local, "metrics.csv.lock"), b"")
    assert sync.upload_directory("run", local) == 1
    assert not os.path.exists(os.path.join(remote, "run", "metrics.csv.lock"))


def test_periodic_timer_runs_and_stops(disk_sync):
    sync, _, _ = disk_sync
    fired = threading.Event()
    counter = {"n": 0}

    def tick():
        counter["n"] += 1
        fired.set()

    sync.register_timer(tick, interval=0.05)
    assert fired.wait(timeout=5.0)
    sync.stop_all_timers()
    n = counter["n"]
    time.sleep(0.2)
    assert counter["n"] == n  # no more firings after stop


def test_engine_wiring(tmp_path):
    remote = tmp_path / "share"
    remote.mkdir()
    out = tmp_path / "exp1"
    sync = FileSyncUtils(DiskSyncBackend(str(remote)))
    eng = BaseEngine(output_dir=str(out), sync_utils=sync)
    _write(str(out / "metrics.csv"), b"rows")
    assert eng.sync_now() == 1
    assert (remote / "exp1" / "metrics.csv").exists()
    eng.start_periodic_sync(interval=60.0)
    _write(str(out / "late.txt"), b"late")
    eng.stop_sync()  # final pass pushes the late file
    assert (remote / "exp1" / "late.txt").exists()
    # engines without sync_utils: all three are harmless no-ops
    plain = BaseEngine(output_dir=str(tmp_path / "exp2"))
    assert plain.sync_now() == 0
    assert plain.start_periodic_sync() is None
    plain.stop_sync()


class _FakeSSHRunner:
    """Executes the ssh/scp command lines against a local directory, so the
    SSHSyncBackend logic is exercised without a network."""

    def __init__(self, root):
        self.root = str(root)
        self.calls = []

    def __call__(self, cmd):
        import subprocess
        self.calls.append(cmd)
        if cmd[0] == "ssh":
            # cmd = ["ssh", host, shell-command] — run it against root by
            # rewriting absolute remote paths under root.
            shell = cmd[-1].replace("/srv/exp", self.root)
            out = subprocess.run(["bash", "-c", shell], capture_output=True,
                                 text=True, check=True).stdout
            return out.replace(self.root, "/srv/exp")
        if cmd[0] == "scp":
            # ["scp", "-q", src, dst] with host: prefixes on the remote side
            src, dst = cmd[-2], cmd[-1]
            src = src.split(":", 1)[1] if ":" in src else src
            dst = dst.split(":", 1)[1] if ":" in dst else dst
            src = src.replace("/srv/exp", self.root)
            dst = dst.replace("/srv/exp", self.root)
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            import shutil
            shutil.copy2(src, dst)
            return ""
        raise AssertionError(f"unexpected transport {cmd!r}")


def test_ssh_backend_through_fake_transport(tmp_path):
    remote_root = tmp_path / "sshremote"
    remote_root.mkdir()
    runner = _FakeSSHRunner(remote_root)
    backend = SSHSyncBackend("worker@build-host", base_dir="/srv/exp",
                             runner=runner)
    sync = FileSyncUtils(backend)
    src = tmp_path / "params.pkl"
    _write(str(src), b"weights")
    assert sync.upload("run/params.pkl", str(src)) is True
    assert (remote_root / "run" / "params.pkl").read_bytes() == b"weights"
    assert backend.exists("run/params.pkl")
    assert list(backend.iter_dir("run")) == ["params.pkl"]
    # remote crc32 via the remote python one-liner matches the local file
    assert backend.checksum("run/params.pkl") == _crc32_file(str(src))
    dst = tmp_path / "back.pkl"
    assert sync.download("run/params.pkl", str(dst)) is True
    assert dst.read_bytes() == b"weights"
    backend.delete("run/params.pkl")
    assert not backend.exists("run/params.pkl")


class _FakeObjectStoreRunner:
    """Implements `<cli> ls/cp/rm` against a local dict-backed bucket."""

    def __init__(self, root):
        self.root = str(root)

    def _path(self, url):
        assert url.startswith("gs://bucket/")
        return os.path.join(self.root, url[len("gs://bucket/"):])

    def __call__(self, cmd):
        import shutil
        verb = cmd[1]
        if verb == "ls":
            target = cmd[-1]
            base = self._path(target)
            if target.endswith("/"):
                out = []
                for dirpath, _, files in os.walk(base):
                    for fn in sorted(files):
                        rel = os.path.relpath(os.path.join(dirpath, fn), base)
                        out.append(target + rel)
                return "\n".join(out) + ("\n" if out else "")
            if not os.path.exists(base):
                raise RuntimeError("no such object")
            return target + "\n"
        if verb == "cp":
            src, dst = cmd[2], cmd[3]
            src = self._path(src) if src.startswith("gs://") else src
            dst = self._path(dst) if dst.startswith("gs://") else dst
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            shutil.copy2(src, dst)
            return ""
        if verb == "rm":
            os.remove(self._path(cmd[2]))
            return ""
        raise AssertionError(f"unexpected verb {verb}")


def test_object_store_backend_through_fake_cli(tmp_path):
    bucket = tmp_path / "bucket"
    bucket.mkdir()
    backend = ObjectStoreSyncBackend("gs://bucket/exp",
                                     runner=_FakeObjectStoreRunner(bucket))
    sync = FileSyncUtils(backend)
    src = tmp_path / "m.csv"
    _write(str(src), b"rows")
    assert sync.upload("run1/m.csv", str(src)) is True
    assert backend.exists("run1/m.csv")
    assert list(backend.iter_dir("run1")) == ["m.csv"]
    # no store-side crc32 -> re-upload transfers again rather than skipping
    assert sync.upload("run1/m.csv", str(src)) is True
    dst = tmp_path / "m_back.csv"
    assert sync.download("run1/m.csv", str(dst), checksum=False) is True
    assert dst.read_bytes() == b"rows"
    backend.delete("run1/m.csv")
    assert not backend.exists("run1/m.csv")


def test_missing_transport_binary_fails_clearly(tmp_path):
    backend = ObjectStoreSyncBackend(
        "gs://bucket/exp", cli=("definitely-not-a-real-cli-9f2a",))
    sync = FileSyncUtils(backend)
    src = tmp_path / "x.bin"
    _write(str(src), b"1")
    with pytest.raises(RuntimeError, match="not available"):
        sync.upload("x.bin", str(src), checksum=False)
