"""Task-axis metrics: downstream-task quality of decoded images.

Parity targets:
  * cbench/benchmark/metrics/image_classification_metric.py — top-1/top-5
    accuracy of a classifier run on decoded images (the reference wraps
    torchvision models; here the classifier is a pluggable function so any
    jax/flax model — or a tiny probe trained in-test — slots in).
  * cbench/benchmark/metrics/detectron2_metrics.py — detection mAP on
    decoded images (the reference wraps detectron2; here the detector is a
    pluggable function and the COCO-style AP aggregation is implemented
    directly, so no framework dependency).

All metrics follow the BatchedImageDistortion protocol used by
BenchmarkTestingWorker: reset() / __call__(decoded, original) /
collect_metrics().
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


class TaskMetric:
    """Protocol base: accumulate per-sample task results."""

    def reset(self):
        raise NotImplementedError

    def __call__(self, decoded, original, sample_idx: int = 0):
        raise NotImplementedError

    def collect_metrics(self) -> Dict[str, float]:
        raise NotImplementedError


class ImageClassificationMetric(TaskMetric):
    """Top-1/top-5 accuracy of ``classifier_fn`` on decoded images.

    classifier_fn: (H, W, 3) uint8/float image -> (num_classes,) logits.
    labels: optional per-sample ground truth. Without labels, reports
    prediction CONSISTENCY instead: how often the decoded image keeps the
    class predicted on the original (the compression-robustness measure
    used when no annotations ship with the data).
    """

    def __init__(self, classifier_fn: Callable,
                 labels: Optional[Sequence[int]] = None, topk: int = 5):
        self.classifier_fn = classifier_fn
        self.labels = None if labels is None else list(labels)
        self.topk = topk
        self.reset()

    def reset(self):
        self._top1 = []
        self._topk_hits = []
        self._consistent = []

    def __call__(self, decoded, original, sample_idx: int = 0):
        logits = np.asarray(self.classifier_fn(decoded))
        pred = int(np.argmax(logits))
        order = np.argsort(logits)[::-1][: self.topk]
        if self.labels is not None:
            label = int(self.labels[sample_idx])
            self._top1.append(pred == label)
            self._topk_hits.append(label in order)
        ref_pred = int(np.argmax(np.asarray(self.classifier_fn(original))))
        self._consistent.append(pred == ref_pred)

    def collect_metrics(self) -> Dict[str, float]:
        out = {"task_pred_consistency": float(np.mean(self._consistent))
               if self._consistent else 0.0}
        if self.labels is not None and self._top1:
            out["task_top1_acc"] = float(np.mean(self._top1))
            out[f"task_top{self.topk}_acc"] = float(np.mean(self._topk_hits))
        return out


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU matrix for (N,4) and (M,4) xyxy boxes."""
    a = np.asarray(a, np.float64).reshape(-1, 4)
    b = np.asarray(b, np.float64).reshape(-1, 4)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=-1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=-1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def average_precision(scores: np.ndarray, matched: np.ndarray,
                      num_gt: int) -> float:
    """101-point-interpolated AP (COCO convention) from per-detection
    confidence scores and greedy match flags."""
    if num_gt == 0 or len(scores) == 0:
        return 0.0
    order = np.argsort(-np.asarray(scores))
    tp = np.cumsum(np.asarray(matched, np.float64)[order])
    fp = np.cumsum(1.0 - np.asarray(matched, np.float64)[order])
    recall = tp / num_gt
    precision = tp / np.maximum(tp + fp, 1e-9)
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        p = precision[recall >= r]
        ap += (p.max() if p.size else 0.0) / 101.0
    return float(ap)


class ObjectDetectionMAPMetric(TaskMetric):
    """COCO-style mAP of ``detector_fn`` on decoded images.

    detector_fn: image -> dict(boxes=(N,4) xyxy, scores=(N,), classes=(N,)).
    ground_truth: per-sample dict(boxes=(M,4), classes=(M,)).
    Reports mAP@[.5:.95] and AP50, matching detections greedily per class
    at each IoU threshold (the detectron2/COCOeval aggregation re-derived
    without the framework).
    """

    IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05)

    def __init__(self, detector_fn: Callable,
                 ground_truth: Sequence[Dict[str, np.ndarray]]):
        self.detector_fn = detector_fn
        self.ground_truth = list(ground_truth)
        self.reset()

    def reset(self):
        # per (class, iou_idx): lists of (score, matched) + gt counts
        self._dets: Dict[tuple, List[tuple]] = {}
        self._gt_counts: Dict[int, int] = {}

    def __call__(self, decoded, original, sample_idx: int = 0):
        gt = self.ground_truth[sample_idx]
        det = self.detector_fn(decoded)
        gt_boxes = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
        gt_cls = np.asarray(gt["classes"], np.int64).reshape(-1)
        boxes = np.asarray(det["boxes"], np.float64).reshape(-1, 4)
        scores = np.asarray(det["scores"], np.float64).reshape(-1)
        cls = np.asarray(det["classes"], np.int64).reshape(-1)

        for c in np.unique(np.concatenate([gt_cls, cls])):
            gi = np.nonzero(gt_cls == c)[0]
            di = np.nonzero(cls == c)[0]
            self._gt_counts[int(c)] = self._gt_counts.get(int(c), 0) + len(gi)
            if len(di) == 0:
                continue
            iou = box_iou(boxes[di], gt_boxes[gi]) if len(gi) else \
                np.zeros((len(di), 0))
            order = np.argsort(-scores[di])
            for t_idx, thr in enumerate(self.IOU_THRESHOLDS):
                taken = np.zeros(len(gi), bool)
                for d in order:
                    matched = False
                    if iou.shape[1]:
                        best = int(np.argmax(np.where(taken, -1.0, iou[d])))
                        if iou[d, best] >= thr and not taken[best]:
                            taken[best] = True
                            matched = True
                    self._dets.setdefault((int(c), t_idx), []).append(
                        (float(scores[di][d]), matched))

    def collect_metrics(self) -> Dict[str, float]:
        ap_by_thr: List[List[float]] = [[] for _ in self.IOU_THRESHOLDS]
        for c, num_gt in self._gt_counts.items():
            # COCO/detectron2 convention: classes with no ground truth do not
            # enter the AP mean (false positives on them are already penalized
            # nowhere, and AP=0 entries would bias task_map low).
            if num_gt == 0:
                continue
            for t_idx in range(len(self.IOU_THRESHOLDS)):
                entries = self._dets.get((c, t_idx), [])
                scores = np.array([e[0] for e in entries])
                matched = np.array([e[1] for e in entries], bool)
                ap_by_thr[t_idx].append(
                    average_precision(scores, matched, num_gt))
        means = [float(np.mean(v)) if v else 0.0 for v in ap_by_thr]
        return {"task_map": float(np.mean(means)) if means else 0.0,
                "task_ap50": means[0] if means else 0.0}


class FeatureFidelityMetric(TaskMetric):
    """Cosine similarity between feature embeddings of original and decoded
    images under ``feature_fn`` — a framework-free proxy for downstream-task
    degradation when no labels or detectors are available."""

    def __init__(self, feature_fn: Callable):
        self.feature_fn = feature_fn
        self.reset()

    def reset(self):
        self._sims = []

    def __call__(self, decoded, original, sample_idx: int = 0):
        fa = np.asarray(self.feature_fn(decoded), np.float64).reshape(-1)
        fb = np.asarray(self.feature_fn(original), np.float64).reshape(-1)
        denom = np.linalg.norm(fa) * np.linalg.norm(fb)
        self._sims.append(float(fa @ fb / max(denom, 1e-12)))

    def collect_metrics(self) -> Dict[str, float]:
        return {"task_feature_cosine": float(np.mean(self._sims))
                if self._sims else 0.0}
