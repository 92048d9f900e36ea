"""Topogroup-pattern ablation grid.

Parity: reference configs/lossy_latent_graph_topogroup_abl.py (1446 LoC,
experiment names at :248-1421) + .._abl_kernel.py (:255-348): the intra-node
BayesNet ablations over fixed patterns (channelwise-gN, checkerboard,
interlace-checkerboard, raster2x2, ELIC split), learned discrete topogroups
at (channel-groups g, spatial-groups s) grid points, continuous-relaxation
learned variants, and context-kernel sizes k3/k5/k7.

Name mapping (reference -> repo build):
  hyperprior-ar-base                      checkerboard, g1
  hyperprior-ar-channelwise-g{2,4,8,10}   pattern=channelwise, groups=N
  hyperprior-ar-checkerboard              pattern=checkerboard
  hyperprior-ar-interlace-checkerboard-g2 pattern=interlace-checkerboard
  hyperprior-ar-raster2x2                 pattern=raster2x2
  hyperprior-ar-elic                      pattern=elic, splits (1,1,2,4,rest)
  hyperprior-ar-learned-g{G}-s{S}         pattern=learned (VIMCO MC
                                          estimator = the reference's
                                          rand-iter discrete search role),
                                          channel groups G, spatial groups S
  hyperprior-ar-cont-learned-param-g{G}   pattern=learned, relaxation
                                          estimator (continuous params)
  .._abl_kernel k{3,5,7}                  context kernel size sweep

All at the reference's single ablation rate point λ=145.2225 (:268).

Run: python tools/run_benchmark.py configs/lossy_latent_graph_topogroup_abl.py
Env: CBENCH_ABL_EXPS=comma,separated,names to subset; CBENCH_SMALL=1 to
shrink. `config` is a ClassBuilderList — one experiment dir per name.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

import jax

from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark
from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.config import ClassBuilder, ClassBuilderList, ParamSlot
from cbench_basic_tpu.config.import_utils import import_config_from_file
from cbench_basic_tpu.graph.builders import build_topogroup_hyperprior_graph

_test_data = import_config_from_file(os.path.join(_HERE, "datasets", "kodak.py"))
_trainer = import_config_from_file(os.path.join(_HERE, "trainer", "nn_trainer.py"))

_SMALL = os.environ.get("CBENCH_SMALL") == "1"
LMBDA = 145.2225 / 255 ** 2

# name -> build_topogroup_hyperprior_graph kwargs
ABLATIONS = {
    "hyperprior-ar-base": dict(pattern="checkerboard"),
    "hyperprior-ar-checkerboard-ft": dict(pattern="checkerboard"),
    "hyperprior-ar-channelwise-g2-ft": dict(
        pattern="channelwise", num_channel_groups=2),
    "hyperprior-ar-channelwise-g4-ft": dict(
        pattern="channelwise", num_channel_groups=4),
    "hyperprior-ar-channelwise-g8-ft": dict(
        pattern="channelwise", num_channel_groups=8),
    "hyperprior-ar-channelwise-g10-ft": dict(
        pattern="channelwise", num_channel_groups=10),
    "hyperprior-ar-channelwise-checkerboard-g2-ft": dict(
        pattern="channelwise-checkerboard", num_channel_groups=2),
    "hyperprior-ar-interlace-checkerboard-g2-ft": dict(
        pattern="interlace-checkerboard", num_channel_groups=2),
    "hyperprior-ar-raster2x2-ft": dict(pattern="raster2x2"),
    "hyperprior-ar-elic-ft": dict(
        pattern="elic", num_channel_groups=12,
        channel_splits=(1, 1, 2, 4, 4)),
    # learned discrete topogroups over the (g, s) grid (:350-1420)
    "hyperprior-ar-learned-g1-s2-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=1,
        num_topo_groups=2),
    "hyperprior-ar-learned-g2-s2-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=2,
        num_topo_groups=2),
    "hyperprior-ar-learned-g4-s2-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=4,
        num_topo_groups=2),
    "hyperprior-ar-learned-g6-s2-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=6,
        num_topo_groups=2),
    "hyperprior-ar-learned-g2-s4-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=2,
        num_topo_groups=4),
    "hyperprior-ar-learned-g4-s4-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=4,
        num_topo_groups=4),
    "hyperprior-ar-learned-g8-s4-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=8,
        num_topo_groups=4),
    "hyperprior-ar-learned-g2-s8-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=2,
        num_topo_groups=8),
    "hyperprior-ar-learned-g4-s8-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=4,
        num_topo_groups=8),
    "hyperprior-ar-learned-g8-s8-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=8,
        num_topo_groups=8),
    "hyperprior-ar-learned-g4-s10-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=4,
        num_topo_groups=10),
    "hyperprior-ar-learned-g8-s10-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=8,
        num_topo_groups=10),
    # remaining reference (g, s) grid points, exact names (:350-1420; g6-s8
    # is commented out in the reference but kept buildable here)
    "hyperprior-ar-learned-randiter1e6-g1-s4-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=1,
        num_topo_groups=4),
    "hyperprior-ar-learned-randiter1e6-g6-s4-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=6,
        num_topo_groups=4),
    "hyperprior-ar-learned-randiter1e6-g6-s8-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=6,
        num_topo_groups=8),
    "hyperprior-ar-learned-randiter1e6-g12-s8-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=12,
        num_topo_groups=8),
    "hyperprior-ar-learned-randiter1e6-g6-s10-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=6,
        num_topo_groups=10),
    "hyperprior-ar-learned-randiter1e6-g12-s10-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=12,
        num_topo_groups=10),
    # continuous-relaxation learned params (:508-610; gG = G channel
    # groups at s2, matching the reference's channel_groups=G slots)
    "hyperprior-ar-cont-learned-param-g2-s2-p2-ft": dict(
        pattern="learned", learned_estimator="relaxation",
        num_channel_groups=2, num_topo_groups=2),
    "hyperprior-ar-cont-learned-param-g4-s2-p2-ft": dict(
        pattern="learned", learned_estimator="relaxation",
        num_channel_groups=4, num_topo_groups=2),
    "hyperprior-ar-cont-learned-param-g6-s2-p2-ft": dict(
        pattern="learned", learned_estimator="relaxation",
        num_channel_groups=6, num_topo_groups=2),
    # no-AR hyperprior baseline (commented out in the reference grid but
    # referenced by its 2-stage flows; plain mean-scale hyperprior)
    "hyperprior": dict(_plain_hyperprior=True),
    # context-kernel ablations (_abl_kernel.py:262-348)
    "hyperprior-ar-learned-k3-g2-s2-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=2,
        num_topo_groups=2, kernel=3),
    "hyperprior-ar-learned-k7-g2-s2-p2-ft": dict(
        pattern="learned", learned_estimator="vimco", num_channel_groups=2,
        num_topo_groups=2, kernel=7),
}

# Exact reference experiment names -> ABLATIONS keys. The reference's
# `randiter1e6` tag names its discrete-structure random-search schedule
# (training_pgm_logits_use_random_num_iter=1e6, abl.py:361); this repo's
# learned-topogroup training explores structures with the VIMCO MC
# estimator instead, so each tagged name aliases the matching (g, s) build.
REFERENCE_ALIASES = {
    f"hyperprior-ar-learned-randiter1e6-g{g}-s{s}-p2-ft":
        f"hyperprior-ar-learned-g{g}-s{s}-p2-ft"
    for g, s in ((1, 2), (2, 2), (4, 2), (6, 2), (2, 4), (4, 4), (8, 4),
                 (2, 8), (4, 8), (8, 8), (4, 10), (8, 10))
}
REFERENCE_ALIASES.update({
    # _abl_kernel.py names its kernel sweeps with a randiter4e6 tag
    "hyperprior-ar-learned-k3-randiter1e6-g2-s2-p2-ft":
        "hyperprior-ar-learned-k3-g2-s2-p2-ft",
    "hyperprior-ar-learned-k7-randiter1e6-g2-s2-p2-ft":
        "hyperprior-ar-learned-k7-g2-s2-p2-ft",
    "hyperprior-ar-learned-k3-randiter4e6-g2-s2-p2-ft":
        "hyperprior-ar-learned-k3-g2-s2-p2-ft",
    "hyperprior-ar-learned-k7-randiter4e6-g2-s2-p2-ft":
        "hyperprior-ar-learned-k7-g2-s2-p2-ft",
})


def resolve_abl_name(exp: str) -> str:
    """Reference name or repo name -> ABLATIONS key (KeyError if unknown)."""
    exp = REFERENCE_ALIASES.get(exp, exp)
    if exp not in ABLATIONS:
        raise KeyError(exp)
    return exp


def abl_codec(exp: str = "hyperprior-ar-base"):
    kw = dict(ABLATIONS[resolve_abl_name(exp)])
    n = m = (24 if _SMALL else 192)
    if kw.pop("_plain_hyperprior", False):
        from cbench_basic_tpu.graph.builders import build_hyperprior_graph
        model, specs = build_hyperprior_graph(N=n, M=m, lmbda=LMBDA)
    else:
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
                      default="hyperprior-ar-base")),
    dataloader=_test_data,
    trainer=_trainer,
).set_override_name("topogroup_abl")

_EXPS = os.environ.get("CBENCH_ABL_EXPS")
_names = _EXPS.split(",") if _EXPS else sorted(ABLATIONS)
config = _bench.batch_update_slot_params(exp=_names)
