"""Trainable predefined-counts table-code sub-config.

Parity: reference configs/codecs/general/entropy_models/basic_fse_predcnt.py
(TrainablePredCntTANSEntropyCoder, fse.py:180-340 — tables trained offline
and held in codec state so headers are never transmitted). Maps to
TrainableTableCodeCodec (codecs/table_code.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.table_code import TrainableTableCodeCodec

config = ClassBuilder(
    TrainableTableCodeCodec,
    value_range=ParamSlot("value_range", default=4096),
    max_symbol=ParamSlot("max_symbol", default=255),
    max_bits=ParamSlot("max_bits", default=31),
).set_override_name("basic_fse_predcnt")
