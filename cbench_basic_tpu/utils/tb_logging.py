"""TensorBoard training-cache logging.

Parity target: the reference's Lightning/TB logging of training caches —
scalar moniter_dict entries every step, histogram (hist_dict) and image
(image_dict) caches flushed periodically (cbench/nn/trainer.py
_LightningBasicModelWrapper logging + SimpleNNTrainer tensorboard wiring).

Falls back to npz snapshots when tensorboard is unavailable so headless
environments still record the same caches.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


class TrainingLogWriter:
    """Scalars / histograms / images to TensorBoard (or npz fallback)."""

    def __init__(self, log_dir: Optional[str]):
        self.log_dir = log_dir
        self._writer = None
        self._fallback: Dict[str, list] = {}
        if log_dir is None:
            return
        os.makedirs(log_dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._writer = None

    def add_scalars(self, metrics: Dict[str, float], step: int):
        if self.log_dir is None:
            return
        if self._writer is not None:
            for k, v in metrics.items():
                if np.isscalar(v) or np.ndim(v) == 0:
                    try:
                        self._writer.add_scalar(k, float(v), step)
                    except (TypeError, ValueError):
                        pass
        else:
            self._fallback.setdefault("scalars", []).append(
                {"step": step, **{k: float(v) for k, v in metrics.items()
                                  if np.isscalar(v) or np.ndim(v) == 0}})

    def add_histogram(self, name: str, values, step: int):
        if self.log_dir is None:
            return
        arr = np.asarray(values).reshape(-1)
        if self._writer is not None:
            try:
                self._writer.add_histogram(name, arr, step)
            except (TypeError, ValueError):
                pass
        else:
            counts, edges = np.histogram(arr, bins=64)
            self._fallback.setdefault("hists", []).append(
                {"step": step, "name": name, "counts": counts, "edges": edges})

    def add_param_histograms(self, params, step: int, prefix: str = "params"):
        """Histogram every parameter leaf (the reference's hist_dict cache
        flush of module weights)."""
        import jax
        flat = jax.tree_util.tree_leaves_with_path(params)
        for path, leaf in flat:
            name = prefix + "/" + "/".join(
                getattr(p, "key", str(p)) for p in path)
            self.add_histogram(name, np.asarray(leaf), step)

    def add_image(self, name: str, image, step: int):
        """image: (H, W, C) float [0,1] or uint8 (the image_dict cache)."""
        if self.log_dir is None:
            return
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
        if self._writer is not None:
            try:
                self._writer.add_image(name, img, step, dataformats="HWC")
            except (TypeError, ValueError):
                pass
        else:
            self._fallback.setdefault("images", []).append(
                {"step": step, "name": name, "image": img})

    def flush(self):
        if self._writer is not None:
            self._writer.flush()
        elif self.log_dir is not None and self._fallback:
            import pickle
            with open(os.path.join(self.log_dir, "training_log.pkl"),
                      "wb") as f:
                pickle.dump(self._fallback, f)

    def close(self):
        self.flush()
        if self._writer is not None:
            self._writer.close()
