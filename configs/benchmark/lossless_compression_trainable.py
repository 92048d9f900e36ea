"""Benchmark sub-config: lossless benchmark whose codec trains first —
a trainer slot attaches to the codec via the SelfTrainableInterface
protocol and run_training() fires before testing.

Parity: reference configs/benchmark/lossless_compression_trainable.py."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark


def _build(codec=None, dataloader=None, trainer=None,
           verify_lossless=True, compute_distortion=False):
    if trainer is not None and hasattr(codec, "set_trainer"):
        codec.set_trainer(trainer)
    return BasicCompressionBenchmark(
        codec, dataloader, verify_lossless=verify_lossless,
        compute_distortion=compute_distortion)


config = ClassBuilder(
    _build,
    codec=ParamSlot("codec", default=None),
    dataloader=ParamSlot("dataloader", default=None),
    trainer=ParamSlot("trainer", default=None),
    verify_lossless=ParamSlot("verify_lossless", default=True),
    compute_distortion=ParamSlot("compute_distortion", default=False),
).set_override_name("lossless_compression_trainable")
