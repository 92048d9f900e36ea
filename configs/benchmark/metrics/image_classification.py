"""Metric sub-config: classification top-k accuracy + prediction
consistency on decompressed images.

Parity: reference configs/benchmark/metrics/image_classification.py
(torchvision classifier) — framework-free classifier-fn contract
(bench/task_metrics.py:38)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.bench.task_metrics import ImageClassificationMetric

config = ClassBuilder(
    ImageClassificationMetric,
    classifier_fn=ParamSlot("classifier_fn", default=None),
).add_all_kwargs_as_param_slot().set_override_name("image_classification")
