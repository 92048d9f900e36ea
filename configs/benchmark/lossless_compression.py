"""Benchmark sub-config: lossless compression benchmark (codec +
dataloader slots; round-trip verification ON, distortion off).

Parity: reference configs/benchmark/lossless_compression.py over
BasicLosslessCompressionBenchmark."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark

config = ClassBuilder(
    BasicCompressionBenchmark,
    codec=ParamSlot("codec", default=None),
    dataloader=ParamSlot("dataloader", default=None),
    verify_lossless=ParamSlot("verify_lossless", default=True),
    compute_distortion=ParamSlot("compute_distortion", default=False),
).set_override_name("lossless_compression")
