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

# Name-for-name map of the reference file's experiments (ACTIVE names at
# :248-783; names the reference keeps commented out are below, still
# buildable). Suffix semantics:
#   -ft          stage-2 fine-tune from the hyperprior-ar-base checkpoint
#                (2-stage flow; exercised end-to-end by
#                tests/test_stage2_finetune.py)
#   -random      stage-2 resumed from the channelgN-random baseline ckpt
#   randprob0.999 the reference's random-logit exploration schedule — the
#                learned builds here explore via the VIMCO MC estimator
REFERENCE_EXPERIMENTS = {
    "hyperprior-ar-base": dict(pattern="checkerboard"),
    "hyperprior-ar-learned-randprob0.999-g2-s2-p2-ft": dict(
        pattern="learned", learned_estimator="vimco",
        num_channel_groups=2, num_topo_groups=2),
    "hyperprior-ar-channelwise-g2-ft": dict(
        pattern="channelwise", num_channel_groups=2),
    "hyperprior-ar-checkerboard-ft": dict(pattern="checkerboard"),
    "hyperprior-ar-channelwise-g4-ft": dict(
        pattern="channelwise", num_channel_groups=4),
    "hyperprior-ar-raster2x2-ft": dict(pattern="raster2x2"),
    "hyperprior-ar-learned-g4-s4-p2-ft-random": dict(
        pattern="learned", learned_estimator="vimco",
        num_channel_groups=4, num_topo_groups=4),
    "hyperprior-ar-elic-ft": dict(
        pattern="elic", num_channel_groups=12,
        channel_splits=(1, 1, 2, 4, 4)),
    "hyperprior-ar-learned-g12-s10-p2-ft-random": dict(
        pattern="learned", learned_estimator="vimco",
        num_channel_groups=12, num_topo_groups=10),
    "hyperprior-ar-scanline-ft": dict(pattern="scanline"),
    # --- commented out in the reference file, kept buildable here ---
    "hyperprior": dict(_plain_hyperprior=True),
    "hyperprior-ar-channelg2-random": dict(
        pattern="random", num_channel_groups=2, num_topo_groups=8),
    "hyperprior-ar-channelg4-random": dict(
        pattern="random", num_channel_groups=4, num_topo_groups=8),
    "hyperprior-ar-channelg12-random": dict(
        pattern="random", num_channel_groups=12, num_topo_groups=12),
    "hyperprior-ar-learned-g2-s2-p2-ft-random": dict(
        pattern="learned", learned_estimator="vimco",
        num_channel_groups=2, num_topo_groups=2),
    "hyperprior-ar-learned-g12-s8-p2-ft-random": dict(
        pattern="learned", learned_estimator="vimco",
        num_channel_groups=12, num_topo_groups=8),
    "hyperprior-ar-channelwise-checkerboard-g2-ft": dict(
        pattern="channelwise-checkerboard", num_channel_groups=2),
    "hyperprior-ar-channelwise-g10-ft": dict(
        pattern="channelwise", num_channel_groups=10),
}


def reference_codec(exp: str = "hyperprior-ar-base"):
    """Build any reference-named experiment from this file's map."""
    import jax
    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.graph.builders import (
        build_hyperprior_graph, build_topogroup_hyperprior_graph)

    kw = dict(REFERENCE_EXPERIMENTS[exp])
    n = m = (24 if _SMALL else 192)
    lmbda = 145.2225 / 255 ** 2
    if kw.pop("_plain_hyperprior", False):
        model, specs = build_hyperprior_graph(N=n, M=m, lmbda=lmbda)
    else:
        model, specs = build_topogroup_hyperprior_graph(
            N=n, M=m, lmbda=lmbda,
            context_channels=(32 if _SMALL else 2 * m), **kw)
    codec = LatentGraphCodec(model, specs, lmbda=lmbda)
    import jax as _jax
    codec.init_params(_jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    return codec


_bench = ClassBuilder(
    BasicCompressionBenchmark,
    codec=_codec,
    dataloader=_test_data,
    trainer=_trainer,
).set_override_name("topogroup_abl")

_REF_EXPS = os.environ.get("CBENCH_REF_EXPS")
if _REF_EXPS:
    # Run reference-named experiments (comma list, or "all")
    from cbench_basic_tpu.config import ParamSlot
    _names = (sorted(REFERENCE_EXPERIMENTS) if _REF_EXPS == "all"
              else _REF_EXPS.split(","))
    _ref_bench = ClassBuilder(
        BasicCompressionBenchmark,
        codec=ClassBuilder(
            reference_codec,
            exp=ParamSlot("exp", choices=sorted(REFERENCE_EXPERIMENTS),
                          default="hyperprior-ar-base")),
        dataloader=_test_data,
        trainer=_trainer,
    ).set_override_name("topogroup")
    config = _ref_bench.batch_update_slot_params(exp=_names)
else:
    # Cartesian slot sweep over the intra-node BayesNet structure.
    config = _bench.batch_update_slot_params(pattern=_patterns, ncg=_ncgs)
