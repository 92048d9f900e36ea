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
           gs_anneal_scheme="const", relax_temp_anneal_scheme="const"):
    gs = dict(GS_SCHEMES.get(gs_anneal_scheme, {}))
    relax = dict(RELAX_SCHEMES.get(relax_temp_anneal_scheme, {}))
    codec = VQVAECodec(VQVAE(hidden=hidden, dim=dim, num_codes=num_codes,
                             quantizer="gssoft"))
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
    gs_anneal_scheme=ParamSlot("gs_anneal_scheme", default="const",
                               choices=sorted(GS_SCHEMES) or ["const"]),
    relax_temp_anneal_scheme=ParamSlot(
        "relax_temp_anneal_scheme", default="const",
        choices=sorted(RELAX_SCHEMES) or ["const"]),
).set_override_name("vqvae_v2")
