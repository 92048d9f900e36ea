"""Machine/environment config (parity: reference configs/env.py).

Override via env vars or an optional env_config.py next to this file.
When dataset directories are absent (e.g. air-gapped CI), configs fall back
to synthetic image datasets so every experiment remains runnable.
"""

import os

TRAIN_DATA_DIR = os.environ.get("CBENCH_TRAIN_DATA", "data/imagenet_subset8000")
TEST_DATA_DIR = os.environ.get("CBENCH_TEST_DATA", "data/kodak")
OUTPUT_DIR = os.environ.get("CBENCH_OUTPUT_DIR", "experiments")

try:
    from env_config import *  # noqa: F401,F403
except ImportError:
    pass
