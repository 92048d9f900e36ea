"""Benchmark sub-config: the per-sample testing worker
(compress -> measure -> decompress -> distortion).

Parity: reference configs/benchmark/worker.py over
BenchmarkTestingWorker."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.bench.benchmark import BenchmarkTestingWorker

config = ClassBuilder(
    BenchmarkTestingWorker,
    codec=ParamSlot("codec", default=None),
    dataloader=ParamSlot("dataloader", default=None),
).set_override_name("benchmark_worker")
