"""BB-ANS lossless codec sub-config.

Parity: reference configs/codecs/general/entropy_models/bbans/bbans.py
(BB-ANS coder, entropy_coder/bbans.py). Maps to BBANSCodec (mixture
latent model + bidirectional ANS stack)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.bbans import BBANSCodec

config = ClassBuilder(
    BBANSCodec,
).add_all_kwargs_as_param_slot().set_override_name("bbans")
