"""Standalone NN-training experiment config (reference configs/nn.py)."""

import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_nn_standalone_cli_runs_and_writes_metrics(tmp_path):
    env = dict(os.environ, CBENCH_SMALL="1", CBENCH_EPOCHS="1",
               JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "run_benchmark.py"),
         os.path.join(ROOT, "configs", "nn_standalone.py"),
         "-o", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    exp_dirs = [d for d in os.listdir(tmp_path)
                if os.path.isdir(tmp_path / d)]
    assert exp_dirs
    csv_path = tmp_path / exp_dirs[0] / "metrics.csv"
    assert csv_path.exists()
    content = csv_path.read_text()
    assert "psnr" in content and "mse" in content
