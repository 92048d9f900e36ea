"""Topogroup ablation experiments (parity: reference
configs/lossy_latent_graph_topogroup.py:248-783 — AR/topogroup pattern and
channel-group ablations as slot sweeps).

`config` is a ClassBuilderList: tools/run_benchmark.py runs every swept
combination into its own experiment directory.

Env knobs: CBENCH_SMALL=1 shrinks the model for smoke runs;
CBENCH_PATTERNS / CBENCH_NCGS override the swept values (comma-separated).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark
from cbench_basic_tpu.config import ClassBuilder
from cbench_basic_tpu.config.import_utils import import_config_from_file

_codec = import_config_from_file(os.path.join(_HERE, "codecs", "topogroup.py"))
_test_data = import_config_from_file(os.path.join(_HERE, "datasets", "kodak.py"))
_trainer = import_config_from_file(os.path.join(_HERE, "trainer", "nn_trainer.py"))

_SMALL = os.environ.get("CBENCH_SMALL") == "1"
if _SMALL:
    _codec.update_slot_params(N=12, M=16, ctx=32)

_patterns = os.environ.get(
    "CBENCH_PATTERNS", "checkerboard,elic,channelwise").split(",")
_ncgs = [int(x) for x in os.environ.get("CBENCH_NCGS", "1,5").split(",")]

_bench = ClassBuilder(
    BasicCompressionBenchmark,
    codec=_codec,
    dataloader=_test_data,
    trainer=_trainer,
).set_override_name("topogroup_abl")

# Cartesian slot sweep over the intra-node BayesNet structure.
config = _bench.batch_update_slot_params(pattern=_patterns, ncg=_ncgs)
