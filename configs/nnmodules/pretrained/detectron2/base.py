"""Detectron2-family base for the detection task axis.

Parity: reference configs/nnmodules/pretrained/detectron2/base.py —
framework-free: a procedural detector-fn satisfying the
ObjectDetectionMAPMetric contract stands in (zero-egress; detectron2 and
its weights are unavailable)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
import numpy as np


def _build(num_classes=8, max_dets=8, seed=0):
    def detector_fn(image):
        img = np.asarray(image)
        h, w = img.shape[:2]
        rng = np.random.default_rng(
            seed + int(img.astype(np.uint64).sum() % 65521))
        n = int(rng.integers(1, max_dets + 1))
        x0 = rng.uniform(0, w * 0.6, n)
        y0 = rng.uniform(0, h * 0.6, n)
        boxes = np.stack([x0, y0,
                          x0 + rng.uniform(w * 0.1, w * 0.4, n),
                          y0 + rng.uniform(h * 0.1, h * 0.4, n)], 1)
        return dict(boxes=boxes.astype(np.float32),
                    scores=rng.uniform(0.1, 1.0, n).astype(np.float32),
                    classes=rng.integers(0, num_classes, n).astype(np.int32))
    return detector_fn


config = ClassBuilder(
    _build,
    num_classes=ParamSlot("num_classes", default=8),
    max_dets=ParamSlot("max_dets", default=8),
    seed=ParamSlot("seed", default=0),
).set_override_name("base")
