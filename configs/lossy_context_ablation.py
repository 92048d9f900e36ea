"""Context-backbone + estimator ablation experiments.

Parity: the reference's _abl experiment suites (configs/lossy_latent_graph
_topogroup ablations + EntroFormer configs) extended to the round-2 axes:
context backbone (conv / attention / maskconv3d) and the learned-topogroup
estimator (relaxation / reinforce / vimco).

`config` is a ClassBuilderList: tools/run_benchmark.py runs every swept
combination into its own experiment directory.

Env knobs: CBENCH_SMALL=1 shrinks the model; CBENCH_CONTEXTS /
CBENCH_ESTIMATORS override the swept values (comma-separated).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

import jax

from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark
from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.config.import_utils import import_config_from_file
from cbench_basic_tpu.graph.builders import build_topogroup_hyperprior_graph

_test_data = import_config_from_file(os.path.join(_HERE, "datasets", "kodak.py"))
_trainer = import_config_from_file(os.path.join(_HERE, "trainer", "nn_trainer.py"))

_SMALL = os.environ.get("CBENCH_SMALL") == "1"


def _build(context="conv", estimator="none", n=192, m=192, lmbda=0.01,
           seed=0):
    if _SMALL:
        n, m = 24, 16
    kw = {}
    if estimator != "none":
        kw.update(pattern="learned", learned_estimator=estimator,
                  num_channel_groups=1)
    else:
        kw.update(pattern="channelwise" if context == "maskconv3d"
                  else "checkerboard",
                  num_channel_groups=4 if context == "maskconv3d" else 1)
    model, specs = build_topogroup_hyperprior_graph(
        N=n, M=m, lmbda=lmbda, context_channels=(32 if _SMALL else 2 * m),
        context_type=context if estimator == "none" else "conv",
        **kw)
    codec = LatentGraphCodec(model, specs, lmbda=lmbda)
    codec.init_params(jax.random.PRNGKey(seed), input_shape=(1, 64, 64, 3))
    return codec


_codec = ClassBuilder(
    _build,
    context=ParamSlot("context",
                      choices=["conv", "attention", "maskconv3d"],
                      default="conv"),
    estimator=ParamSlot("estimator",
                        choices=["none", "relaxation", "reinforce", "vimco"],
                        default="none"),
    lmbda=ParamSlot("lmbda", default=0.01),
).set_override_name("context_abl")

_bench = ClassBuilder(
    BasicCompressionBenchmark,
    codec=_codec,
    dataloader=_test_data,
    trainer=_trainer,
).set_override_name("context_abl")

_contexts = os.environ.get(
    "CBENCH_CONTEXTS", "conv,attention,maskconv3d").split(",")
_estimators = os.environ.get("CBENCH_ESTIMATORS", "none").split(",")

config = _bench.batch_update_slot_params(context=_contexts,
                                         estimator=_estimators)
