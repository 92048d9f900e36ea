"""Autoregressive distribution-grid entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/dist_ar.py
(AutoregressiveImplDistributionEntropyCoder with an `ar_offsets` choice dir
— in-loop AR over causal neighbors inside the native coder). Maps to the
module-parity RefGaussianGridCoder whose `ar` config carries a linear AR
over the selected neighbor window, exported into the native in-loop AR
(compat/ref_gaussian.py RefLinearARConfig; offset patterns from
ar_offsets/). Trained models overwrite the zero-initialized AR weights.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

import numpy as np

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.config.import_utils import import_all_config_from_dir
from cbench_basic_tpu.compat.ref_gaussian import (
    RefGaussianGridCoder,
    RefLinearARConfig,
)

_AR_DIR = os.path.join(os.path.dirname(__file__), "ar_offsets")
ar_offsets_choices = {"none": None}
ar_offsets_choices.update(import_all_config_from_dir(_AR_DIR))


def _build(ar_offsets=None, channels: int = 1, **kwargs):
    ar = None
    if ar_offsets is not None:
        window = len(ar_offsets)
        ar = RefLinearARConfig(
            weight=np.zeros((channels, 1, window), np.float32),
            bias=np.zeros(channels, np.float32),
            ar_offsets=np.asarray(ar_offsets, np.int64),
        )
    return RefGaussianGridCoder(ar=ar, **kwargs)


config = ClassBuilder(
    _build,
    ar_offsets=ParamSlot("ar_offsets", default="none",
                         choices=ar_offsets_choices),
    channels=ParamSlot("channels", default=1),
).set_override_name("dist_ar")
