"""BaSIC scalable-NIC experiment (parity: reference
configs/lossy_graph_scalable_exp.py, incl. the Kodak BD-rate anchor at
:78-82 and BD-Rate mode=1 at :84).

Run: python tools/run_benchmark.py configs/lossy_graph_scalable_exp.py
Env knobs: CBENCH_MODEL selects the preset
(basic|basic-greedy8|ar|hyperprior), CBENCH_SMALL=1 shrinks widths for smoke
runs, CBENCH_EPOCHS etc. shrink training (see presets/common_trainer.py).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "presets"))

from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark
from cbench_basic_tpu.config import ClassBuilder

from presets import common_trainer
from presets import lossy_latent_graph_scalable_ar_models as models

# Kodak BD-rate reference anchor: Ballé hyperprior RD points
# (reference lossy_graph_scalable_exp.py:78-82).
REFERENCE_RD = (
    [5664.23, 9127.43, 14834.27, 23050.91, 33736.85, 47523.30, 64263.34, 84910.23],
    [27.106, 28.679, 30.617, 32.555, 34.581, 36.720, 38.808, 40.795],
)

_MODEL = os.environ.get("CBENCH_MODEL", "basic")
_SMALL = os.environ.get("CBENCH_SMALL") == "1"
_kw = dict(widths=(8, 12, 16), n=16, m=24) if _SMALL else {}

if _MODEL == "basic":
    codec_builder = ClassBuilder(
        models.hyperprior_ar_sc_slimmable_full_dynamic_grouped, **_kw)
elif _MODEL == "basic-greedy8":
    codec_builder = ClassBuilder(
        models.hyperprior_ar_sc_slimmable_full_dynamic_greedy_search_8level, **_kw)
elif _MODEL == "ar":
    codec_builder = ClassBuilder(models.hyperprior_ar_grouped)
elif _MODEL == "hyperprior":
    codec_builder = ClassBuilder(models.hyperprior_grouped)
else:
    raise ValueError(f"unknown CBENCH_MODEL {_MODEL}")

config = ClassBuilder(
    BasicCompressionBenchmark,
    codec=codec_builder,
    trainer=common_trainer.trainer_builder(),
    dataloader=common_trainer.test_dataset_builder(),
    bd_reference_pts=REFERENCE_RD,
    bd_mode=1,
).set_override_name(f"lossy_graph_scalable_{_MODEL}")
