"""VQ-VAE v2 prior model: relaxed-categorical quantizer family with
annealing-scheme slots.

Parity: reference configs/codecs/general/prior_models/vqvae_v2.py
(VQVAEPriorModelV2 — dist_type choices RelaxedOneHotCategorical /
Asymptotic / Double, gs/relax temperature anneal slots; the anneal scheme
choice dirs live next to this file)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.config.import_utils import import_all_config_from_dir
from cbench_basic_tpu.codecs.vq_codec import VQVAECodec
from cbench_basic_tpu.nn.models import VQVAE

_HERE = os.path.dirname(os.path.abspath(__file__))
GS_SCHEMES = import_all_config_from_dir(os.path.join(_HERE,
                                                     "gs_anneal_scheme"))
RELAX_SCHEMES = import_all_config_from_dir(
    os.path.join(_HERE, "relax_temp_anneal_scheme"))


def _build(hidden=128, dim=64, num_codes=512, dist_type="gssoft",
           use_st_gumbel=False, test_sampling=False, kl_cost=1.0,
           commitment_cost_gs=0.0, commitment_over_exp=False,
           gs_anneal_scheme="const", relax_temp_anneal_scheme="const"):
    gs = dict(GS_SCHEMES.get(gs_anneal_scheme, {}))
    relax = dict(RELAX_SCHEMES.get(relax_temp_anneal_scheme, {}))
    opts = (("dist_type", dist_type),
            ("use_st_gumbel", bool(use_st_gumbel)),
            ("test_sampling", bool(test_sampling)),
            ("kl_cost", float(kl_cost)),
            ("commitment_cost", float(commitment_cost_gs)),
            ("commitment_over_exp", bool(commitment_over_exp)))
    codec = VQVAECodec(VQVAE(hidden=hidden, dim=dim, num_codes=num_codes,
                             quantizer="gssoft", quantizer_opts=opts))
    codec.anneal_config = {"dist_type": dist_type, **gs, **relax}
    return codec


config = ClassBuilder(
    _build,
    hidden=ParamSlot("hidden", default=128),
    dim=ParamSlot("dim", default=64),
    num_codes=ParamSlot("num_codes", default=512),
    dist_type=ParamSlot(
        "dist_type", default="gssoft",
        choices=["gssoft", "relaxed", "asymptotic", "double"]),
    use_st_gumbel=ParamSlot("use_st_gumbel", default=False),
    test_sampling=ParamSlot("test_sampling", default=False),
    kl_cost=ParamSlot("kl_cost", default=1.0),
    commitment_cost_gs=ParamSlot("commitment_cost_gs", default=0.0),
    commitment_over_exp=ParamSlot("commitment_over_exp", default=False),
    gs_anneal_scheme=ParamSlot("gs_anneal_scheme", default="const",
                               choices=sorted(GS_SCHEMES) or ["const"]),
    relax_temp_anneal_scheme=ParamSlot(
        "relax_temp_anneal_scheme", default="const",
        choices=sorted(RELAX_SCHEMES) or ["const"]),
).set_override_name("vqvae_v2")
