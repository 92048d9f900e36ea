"""Benchmark sub-config: grouped benchmark — one result row per named
codec, each into its own subdirectory; trainable codecs self-train first.

Parity: reference configs/benchmark/lossless_compression_grouped_trainable.py
over GroupedLosslessCompressionBenchmark."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.bench.benchmark import (
    BasicCompressionBenchmark,
    GroupedCodecBenchmark,
)


def _build(named_codecs=(), dataloader=None, verify_lossless=True,
           output_dir=None, trainer=None):
    base = BasicCompressionBenchmark(
        None, dataloader, verify_lossless=verify_lossless,
        compute_distortion=False)
    if trainer is not None:
        for _, codec in named_codecs:
            if hasattr(codec, "set_trainer"):
                codec.set_trainer(trainer)
    return GroupedCodecBenchmark(base, list(named_codecs),
                                 output_dir=output_dir)


config = ClassBuilder(
    _build,
    named_codecs=ParamSlot("named_codecs", default=()),
    dataloader=ParamSlot("dataloader", default=None),
    verify_lossless=ParamSlot("verify_lossless", default=True),
    trainer=ParamSlot("trainer", default=None),
).set_override_name("lossless_compression_grouped_trainable")
