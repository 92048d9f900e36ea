"""GeneralCodec composition base sub-config.

Parity: reference configs/codecs/general/base.py (GeneralCodec with
preprocessor/prior_model/context_model/entropy_coder slots,
codecs/general_codec.py:18). The repo's GeneralCodec composes
preprocessor → inner codec; prior/context/entropy stages live inside the
inner codec (graph codec / neural codec), matching the TPU redesign."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 3))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.general_codec import GeneralCodec

config = ClassBuilder(
    GeneralCodec,
    inner=ParamSlot("inner"),
    preprocessor=ParamSlot("preprocessor", default=None),
).set_override_name("general")
