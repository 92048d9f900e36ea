"""Pretrained VQ-VAE (EMA) prior model from a local checkpoint.

Parity: reference configs/nnmodules/pretrained/vqvae.py (download URL) —
zero-egress: checkpoint_path must exist locally; params=None otherwise."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
import importlib.util as _ilu

_spec = _ilu.spec_from_file_location("cbench_cfg__utils__pmb", os.path.join(
    _HERE, "..", "..", "utils", "pretrained_model_builder.py"))
_pmb = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_pmb)

from cbench_basic_tpu.nn.models import VQVAE


def _build(hidden=128, dim=64, num_codes=512, checkpoint_path=None):
    return _pmb.load_pretrained(
        VQVAE(hidden=hidden, dim=dim, num_codes=num_codes),
        checkpoint_path)


config = ClassBuilder(
    _build,
    hidden=ParamSlot("hidden", default=128),
    dim=ParamSlot("dim", default=64),
    num_codes=ParamSlot("num_codes", default=512),
    checkpoint_path=ParamSlot("checkpoint_path", default=None),
).set_override_name("pretrained_vqvae")
