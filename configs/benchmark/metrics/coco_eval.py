"""Metric sub-config: COCO-style detection mAP on decompressed images.

Parity: reference configs/benchmark/metrics/coco_eval.py (detectron2
COCOEvaluator) — framework-free AP@[.5:.95] (bench/task_metrics.py:111,
zero-GT classes excluded per COCO convention)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.bench.task_metrics import ObjectDetectionMAPMetric

config = ClassBuilder(
    ObjectDetectionMAPMetric,
    detector_fn=ParamSlot("detector_fn", default=None),
    ground_truth=ParamSlot("ground_truth", default=()),
).add_all_kwargs_as_param_slot().set_override_name("coco_eval")
