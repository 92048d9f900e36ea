"""Hyperprior-variant scalable experiments (NO intra-node AR).

Parity: reference configs/lossy_graph_scalable_exp_hp.py (778 LoC) — the
five grouped experiments assembled at :607-778:
  hyperprior-scalable-slimmable-full-grouped        (SlimCAE)
  hyperprior-sc-slimmable-full-dynamic-grouped      (slimmable + dynamic)
  hyperprior-sc-usdecoder-dynamic-grouped           (universal-slim decoder)
  hyperprior-sc-groupconv-full-grouped              (group-conv PGM ablation)
  hyperprior-sc-static-backbone-grouped             (static control)
with λ = [39.015, 75.8625, 145.2225, 281.775, 541.875] for the first three
(:641,:670,:695) and the 4-λ list for the two ablations (:719,:745), the
hyperprior Kodak BD anchor, and 2000-epoch training defaults.

Run one variant:
  CBENCH_HP_VARIANT=slimmable-dynamic python tools/run_benchmark.py \
      configs/lossy_graph_scalable_exp_hp.py --output-dir /tmp/exp
Run the full sweep: CBENCH_HP_VARIANT=all (a ClassBuilderList; the runner
executes every variant into its own experiment dir).
CBENCH_SMALL=1 shrinks widths for smoke runs.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.join(_HERE, "presets"))

import jax

from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark
from cbench_basic_tpu.codecs.base import GroupedVariableRateCodec
from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.builders import (
    HP_VARIANTS,
    build_scalable_hyperprior_graph,
)

from presets import common_trainer

# Kodak BD-rate anchor (reference lossy_graph_scalable_exp_hp.py:765-771).
REFERENCE_RD = (
    [5664.23, 9127.43, 14834.27, 23050.91, 33736.85, 47523.30, 64263.34,
     84910.23],
    [27.106, 28.679, 30.617, 32.555, 34.581, 36.720, 38.808, 40.795],
)

# :641/:670/:695 use five λs; the two ablation groups (:719/:745) use four.
LAMBDAS_5 = [l / 255 ** 2 for l in
             (39.015, 75.8625, 145.2225, 281.775, 541.875)]
LAMBDAS_4 = LAMBDAS_5[:4]

_SMALL = os.environ.get("CBENCH_SMALL") == "1"


def hp_grouped_codec(variant: str = "slimmable-dynamic"):
    widths = (8, 12, 16) if _SMALL else (48, 72, 96, 144, 192)
    n = m = (24 if _SMALL else 192)
    lambdas = LAMBDAS_4 if variant in ("groupconv-full",
                                       "static-backbone") else LAMBDAS_5
    codecs = []
    for i, lmbda in enumerate(lambdas):
        model, specs, levels = build_scalable_hyperprior_graph(
            variant, N=n, M=m, lmbda=lmbda, widths=widths,
            groups=2 if _SMALL else 4,
            mid_per_group=8 if _SMALL else 48,
            flops_weight=1e-12 if "dynamic" in variant else 0.0)
        codec = LatentGraphCodec(model, specs, complexity_levels=levels,
                                 lmbda=lmbda)
        codec.init_params(jax.random.PRNGKey(i), input_shape=(1, 64, 64, 3))
        codecs.append(codec)
    return GroupedVariableRateCodec(codecs)


_bench = ClassBuilder(
    BasicCompressionBenchmark,
    codec=ClassBuilder(hp_grouped_codec,
                       variant=ParamSlot("variant", choices=list(HP_VARIANTS),
                                         default="slimmable-dynamic")),
    trainer=common_trainer.trainer_builder(),
    dataloader=common_trainer.test_dataset_builder(),
    bd_reference_pts=REFERENCE_RD,
    bd_mode=1,
).set_override_name("lossy_graph_scalable_hp")

# Exact reference experiment names (lossy_graph_scalable_exp_hp.py:607-778)
# -> this file's variant keys. "hyperprior-scalable-slimmable-full" (the
# ungrouped single-codec form) is commented out in the reference;
# "lossy-graph-scalable-hyperprior" is the reference's name for the whole
# grouped benchmark (:753) — here `lossy_graph_scalable_hp`.
REFERENCE_ALIASES = {
    "hyperprior-scalable-slimmable-full": "slimmable-full",
    "hyperprior-scalable-slimmable-full-grouped": "slimmable-full",
    "hyperprior-sc-slimmable-full-dynamic-grouped": "slimmable-dynamic",
    "hyperprior-sc-usdecoder-dynamic-grouped": "usdecoder-dynamic",
    "hyperprior-sc-groupconv-full-grouped": "groupconv-full",
    "hyperprior-sc-static-backbone-grouped": "static-backbone",
}

_VARIANT = os.environ.get("CBENCH_HP_VARIANT", "slimmable-dynamic")
_VARIANT = REFERENCE_ALIASES.get(_VARIANT, _VARIANT)
if _VARIANT == "all":
    config = _bench.batch_update_slot_params(variant=list(HP_VARIANTS))
else:
    config = _bench.update_slot_params(variant=_VARIANT)
