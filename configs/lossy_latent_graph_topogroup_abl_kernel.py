"""Context-kernel ablation grid (dedicated file).

Parity: reference configs/lossy_latent_graph_topogroup_abl_kernel.py
(374 LoC, `lossy-latent-graph-topogroup-abl-kernel-exp` names,
kernel_size=3 at :272 and 7 at :313): context kernel k in {3, 5, 7}
crossed with fixed/learned topogroup structures at the single ablation
rate point lambda=145.2225.

Run: python tools/run_benchmark.py \
    configs/lossy_latent_graph_topogroup_abl_kernel.py
Env: CBENCH_ABL_EXPS=comma,separated,names to subset; CBENCH_SMALL=1.
`config` is a ClassBuilderList — one experiment dir per name.
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

_test_data = import_config_from_file(
    os.path.join(_HERE, "datasets", "kodak.py"))
_trainer = import_config_from_file(
    os.path.join(_HERE, "trainer", "nn_trainer.py"))

_SMALL = os.environ.get("CBENCH_SMALL") == "1"
LMBDA = 145.2225 / 255 ** 2

KERNELS = (3, 5, 7)
STRUCTURES = {
    "checkerboard": dict(pattern="checkerboard"),
    "elic": dict(pattern="elic", num_channel_groups=5),
    "learned-g2-s2": dict(pattern="learned", learned_estimator="vimco",
                          num_channel_groups=2, num_topo_groups=2),
}
ABLATIONS = {
    f"topogroup-abl-kernel-{s}-k{k}": dict(kernel=k, **kw)
    for s, kw in STRUCTURES.items() for k in KERNELS
}

# Exact reference names (_abl_kernel.py:255-348) -> this grid's keys.
# The reference file holds the base structure at the default k=5 and
# trains k3/k7 fine-tunes (randiter4e6 = its discrete random-search
# schedule; the learned builds here explore via the VIMCO estimator).
REFERENCE_ALIASES = {
    "hyperprior-ar-base": "topogroup-abl-kernel-checkerboard-k5",
    "hyperprior-ar-learned-k3-randiter4e6-g2-s2-p2-ft":
        "topogroup-abl-kernel-learned-g2-s2-k3",
    "hyperprior-ar-learned-k7-randiter4e6-g2-s2-p2-ft":
        "topogroup-abl-kernel-learned-g2-s2-k7",
}


def abl_codec(exp: str = "topogroup-abl-kernel-checkerboard-k5"):
    kw = dict(ABLATIONS[REFERENCE_ALIASES.get(exp, exp)])
    n = m = (24 if _SMALL else 192)
    model, specs = build_topogroup_hyperprior_graph(
        N=n, M=m, lmbda=LMBDA,
        context_channels=(32 if _SMALL else 2 * m), **kw)
    codec = LatentGraphCodec(model, specs, lmbda=LMBDA)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    return codec


_bench = ClassBuilder(
    BasicCompressionBenchmark,
    codec=ClassBuilder(
        abl_codec,
        exp=ParamSlot("exp",
                      choices=sorted(set(ABLATIONS) | set(REFERENCE_ALIASES)),
                      default="topogroup-abl-kernel-checkerboard-k5")),
    dataloader=_test_data,
    trainer=_trainer,
).set_override_name("topogroup_abl_kernel")

_EXPS = os.environ.get("CBENCH_ABL_EXPS")
_names = _EXPS.split(",") if _EXPS else sorted(ABLATIONS)
config = _bench.batch_update_slot_params(exp=_names)
