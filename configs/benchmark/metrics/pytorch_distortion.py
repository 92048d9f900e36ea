"""Metric sub-config: batched PSNR / MS-SSIM distortion.

Parity: reference configs/benchmark/metrics/pytorch_distortion.py
(TorchMetrics distortion) — here the jittable JAX implementation
(ops/image_metrics.py) behind the same metric protocol."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.bench.metrics import BatchedImageDistortion

config = ClassBuilder(
    BatchedImageDistortion,
    compute_ms_ssim=ParamSlot("compute_ms_ssim", default=True),
).set_override_name("distortion")
