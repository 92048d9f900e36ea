"""Sub-config: the basic compression benchmark shell; codec/dataloader/
trainer plug in through slots."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark
from cbench_basic_tpu.config import ClassBuilder, ParamSlot

config = ClassBuilder(
    BasicCompressionBenchmark,
    codec=ParamSlot("codec", default=None),
    dataloader=ParamSlot("dataloader", default=None),
    trainer=ParamSlot("trainer", default=None),
    compute_distortion=ParamSlot("compute_distortion", default=True),
    verify_lossless=ParamSlot("verify_lossless", default=False),
).set_override_name("basic_benchmark")
