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


@pytest.mark.skipif(not pretrained.has_checkpoint("flagship_elic_vr4_4400k"),
                    reason="checkpoint not bundled")
def test_vr4_4400k_is_preferred_and_loads():
    # newest bundled checkpoint wins registry preference
    assert pretrained.best_checkpoint() == "flagship_elic_vr4_4400k"
    params = pretrained.load_params("flagship_elic_vr4_4400k")
    import jax
    leaves = jax.tree.leaves(params)
    assert sum(np.asarray(a).size for a in leaves) > 5_000_000
    for a in leaves:
        a = np.asarray(a)
        assert a.dtype != np.float16
        assert np.all(np.isfinite(a))
    assert pretrained.rate_lambdas("flagship_elic_vr4_4400k") == (
        0.0018, 0.0035, 0.0067, 0.013)


@pytest.mark.skipif(not pretrained.has_checkpoint("flagship_elic_vr4_4400k"),
                    reason="checkpoint not bundled")
def test_vr4_4400k_result_artifact_consistent():
    path = os.path.join(pretrained.CHECKPOINT_DIR,
                        "flagship_elic_vr4_4400k.result.json")
    with open(path) as f:
        result = json.load(f)
    reg = pretrained.REGISTRY["flagship_elic_vr4_4400k"]
    lv3 = result["heldout_fp16_restored_levels"][-1]
    assert abs(lv3["bpp"] - reg["heldout_fp16_restored"]["bpp"]) < 1e-3
    assert abs(lv3["psnr"] - reg["heldout_fp16_restored"]["psnr"]) < 0.01
    assert (result["bd_vs_anchors_fp16_restored"]["jpeg"]["bd_rate_pct"]
            == pytest.approx(reg["bd_rate_vs_jpeg_pct"], abs=0.01))
    # the continuation must dominate its seed at every rate level
    seed = json.load(open(os.path.join(
        pretrained.CHECKPOINT_DIR, "flagship_elic_vr4_1400k.result.json")))
    for new, old in zip(result["heldout_fp16_restored_levels"],
                        seed["heldout_fp16_restored_levels"]):
        assert new["bpp"] <= old["bpp"] + 1e-6
        assert new["psnr"] >= old["psnr"] - 1e-6
