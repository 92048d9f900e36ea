"""Grouped zstd-style sequence coder with a smaller (predcnt-era) table log.

Parity: reference configs/codecs/general/entropy_models/
grouped_predcnt_for_lz77_zstd.py (same grouped sequence scheme with
trainable predefined counts). The repo variant keeps per-stream tables in
the header; the trained-table path is TrainableTableCodeCodec
(basic_fse_predcnt.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.fse_codecs import GroupedLZ77EntropyCodec

config = ClassBuilder(
    GroupedLZ77EntropyCodec,
    table_log=ParamSlot("table_log", default=9),
).set_override_name("grouped_predcnt_for_lz77_zstd")
