"""Benchmark metrics: batched distortion (PSNR/MS-SSIM) and Bjøntegaard
delta (BD-PSNR / BD-rate).

Parity: cbench/benchmark/metrics/base.py:5-24, pytorch_distortion.py:21,
bj_delta.py:6-100. The BD computation (cubic polyfit of log-rate vs quality,
integrated over the overlapping interval) follows the standard public
Bjøntegaard formulation used by the reference.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from ..ops.image_metrics import ms_ssim, psnr
from ..utils.logging_utils import MetricLogger


class BaseMetric:
    def __init__(self):
        self.metric_logger = MetricLogger()

    @property
    def metric_names(self):
        return []

    def reset(self):
        self.metric_logger = MetricLogger()

    def collect_metrics(self) -> Dict[str, float]:
        return self.metric_logger.get_global_average()

    def __call__(self, output, target=None) -> Dict[str, float]:
        raise NotImplementedError


class BatchedImageDistortion(BaseMetric):
    """PSNR + MS-SSIM between decompressed and original images.

    Accepts HWC/NHWC uint8 or float arrays; computes on-device via JAX.
    """

    def __init__(self, compute_ms_ssim: bool = True):
        super().__init__()
        self.compute_ms_ssim = compute_ms_ssim

    @property
    def metric_names(self):
        return ["psnr"] + (["ms_ssim"] if self.compute_ms_ssim else [])

    @staticmethod
    def _prep(x) -> np.ndarray:
        x = np.asarray(x)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        if x.ndim == 3:
            x = x[None]
        return x

    def __call__(self, output, target=None) -> Dict[str, float]:
        a = self._prep(output)
        b = self._prep(target)
        result = {"psnr": float(psnr(a, b))}
        if self.compute_ms_ssim and min(a.shape[1], a.shape[2]) >= 176:
            result["ms_ssim"] = float(ms_ssim(a, b))
        self.metric_logger.update(**result)
        return result


def bj_delta(R1: Sequence[float], Q1: Sequence[float], R2: Sequence[float],
             Q2: Sequence[float], mode: int = 0) -> float:
    """Bjøntegaard delta. mode 0: BD-quality (e.g. BD-PSNR in dB);
    mode 1: BD-rate in percent. (R1,Q1)=test curve, (R2,Q2)=reference.

    Sign convention (parity with reference bj_delta.py:48-100, which follows
    github.com/Anserw/Bjontegaard_metric): the delta is reference-minus-test,
    so a POSITIVE BD-rate means the reference curve needs that much more rate
    than the test codec (i.e. positive = test codec is better)."""
    lR1, lR2 = np.log(np.asarray(R1, float)), np.log(np.asarray(R2, float))
    Q1, Q2 = np.asarray(Q1, float), np.asarray(Q2, float)

    if mode == 0:
        x1, y1, x2, y2 = lR1, Q1, lR2, Q2
    else:
        x1, y1, x2, y2 = Q1, lR1, Q2, lR2

    # Cubic when both curves have >=4 points (reference behavior); fewer
    # points lower the degree so the fit is never rank-deficient (a cubic
    # through 2-3 points would print a confident but meaningless delta).
    deg = max(1, min(3, len(x1) - 1, len(x2) - 1))
    p1 = np.polyfit(x1, y1, deg)
    p2 = np.polyfit(x2, y2, deg)
    lo = max(x1.min(), x2.min())
    hi = min(x1.max(), x2.max())
    int1 = np.polyval(np.polyint(p1), hi) - np.polyval(np.polyint(p1), lo)
    int2 = np.polyval(np.polyint(p2), hi) - np.polyval(np.polyint(p2), lo)
    avg_diff = (int2 - int1) / (hi - lo)
    if mode == 0:
        return float(avg_diff)
    return float((np.exp(avg_diff) - 1) * 100)


class BJDeltaMetric(BaseMetric):
    """BD metric over collected (rate, quality) points vs a reference curve."""

    def __init__(self, reference_pts=None,
                 collect_metric_names=("compressed_length", "psnr"), mode: int = 0):
        super().__init__()
        if mode not in (0, 1):
            raise ValueError("mode must be 0 (BD-quality) or 1 (BD-rate)")
        self.reference_pts = reference_pts
        self.collect_metric_names = collect_metric_names
        self.mode = mode

    @property
    def name(self):
        return "bd_psnr" if self.mode == 0 else "bd_rate"

    @property
    def metric_names(self):
        return [self.name]

    def __call__(self, output, target=None) -> Dict[str, float]:
        if target is None:
            target = self.reference_pts
        R1, Q1 = output
        R2, Q2 = target
        try:
            result = {self.name: bj_delta(R1, Q1, R2, Q2, mode=self.mode)}
        except Exception:
            result = {self.name: -100.0}
        self.metric_logger.update(**result)
        return result
