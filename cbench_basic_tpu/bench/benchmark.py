"""Compression benchmark harness.

Parity: reference cbench/benchmark/base.py:23-112 (run/collect/save protocol,
metrics.csv/metrics.pkl outputs), basic_benchmark.py:30-329 (per-sample
testing worker: compress → measure → decompress → distortion) and
basic_benchmark.py:332-1092 (nested task × complexity × rate loops, BD-rate
from collected RD points, metrics_2d.csv export, optional training phase).
"""

from __future__ import annotations

import csv
import hashlib
import pickle
import time
from typing import Any, Dict, List, Optional

import numpy as np

from ..codecs.base import (
    CodecInterface,
    VariableComplexityCodecInterface,
    VariableRateCodecInterface,
    VariableTaskCodecInterface,
)
from ..data.datasets import DataLoaderInterface
from ..utils.engine import BaseEngine, locked_file
from ..utils.logging_utils import MetricLogger
from .metrics import BatchedImageDistortion, bj_delta


class BaseBenchmark(BaseEngine):
    def __init__(self, codec: Optional[CodecInterface] = None, **kwargs):
        super().__init__(**kwargs)
        self.codec = codec
        self.metric_dict: Dict[str, Any] = {}

    def set_codec(self, codec: CodecInterface):
        self.codec = codec

    def run_benchmark(self, **kwargs) -> Dict[str, Any]:
        raise NotImplementedError

    def collect_metrics(self) -> Dict[str, Any]:
        return dict(self.metric_dict)

    def save_metrics(self):
        if self.output_dir is None:
            return
        metrics = self.collect_metrics()
        with locked_file(self.output_path("metrics.csv"), "w") as f:
            writer = csv.writer(f)
            for k, v in metrics.items():
                writer.writerow([k, v])
        with locked_file(self.output_path("metrics.pkl"), "wb") as f:
            pickle.dump(metrics, f)


class BenchmarkTestingWorker:
    """One testing pass: per-sample compress → measure → decompress →
    distortion, with round-trip verification.

    Unlike the reference (which comments out its lossless assertion,
    basic_benchmark.py:233-234), `verify_roundtrip` is on by default for
    lossless codecs via checksum comparison.
    """

    def __init__(self, codec: CodecInterface, dataloader: DataLoaderInterface,
                 compute_distortion: bool = True, save_compressed: bool = False,
                 verify_lossless: bool = False,
                 cache_dir: Optional[str] = None,
                 save_decompressed_dir: Optional[str] = None,
                 task_metric=None):
        self.codec = codec
        self.dataloader = dataloader
        self.distortion = BatchedImageDistortion() if compute_distortion else None
        self.save_compressed = save_compressed
        self.verify_lossless = verify_lossless
        # Optional downstream-task metric (bench/task_metrics.py protocol):
        # classification accuracy / detection mAP on decoded images (parity:
        # detectron2_metrics.py, image_classification_metric.py).
        self.task_metric = task_metric
        # Bitstream caching with input checksums (parity:
        # basic_benchmark.py:186-196 — md5-keyed compressed cache detecting
        # nondeterministic dataloaders).
        self.cache_dir = cache_dir
        self.save_decompressed_dir = save_decompressed_dir

    def _cached_compress(self, data, sample_idx: int) -> bytes:
        import os
        if self.cache_dir is None:
            return self.codec.compress(data)
        os.makedirs(self.cache_dir, exist_ok=True)
        digest = hashlib.md5(np.asarray(data).tobytes()).hexdigest()
        path = os.path.join(self.cache_dir, f"{sample_idx}_{digest}.bin")
        if os.path.exists(path):
            with open(path, "rb") as f:
                return f.read()
        stream = self.codec.compress(data)
        with open(path, "wb") as f:
            f.write(stream)
        return stream

    def __call__(self, logger=None) -> Dict[str, float]:
        ml = MetricLogger()
        if self.distortion is not None:
            self.distortion.reset()
        if self.task_metric is not None:
            self.task_metric.reset()
        for sample_idx, data in enumerate(self.dataloader.iterate()):
            original_bytes = int(np.asarray(data).nbytes)

            t0 = time.perf_counter()
            compressed = self._cached_compress(data, sample_idx)
            t1 = time.perf_counter()
            decompressed = self.codec.decompress(compressed)
            t2 = time.perf_counter()

            if self.save_decompressed_dir is not None:
                import os
                from PIL import Image
                os.makedirs(self.save_decompressed_dir, exist_ok=True)
                arr = np.asarray(decompressed)
                if arr.ndim == 3 and arr.dtype == np.uint8:
                    Image.fromarray(arr).save(os.path.join(
                        self.save_decompressed_dir, f"{sample_idx:04d}.png"))

            if self.verify_lossless:
                a = hashlib.md5(np.asarray(data).tobytes()).hexdigest()
                b = hashlib.md5(np.asarray(decompressed).astype(
                    np.asarray(data).dtype).tobytes()).hexdigest()
                if a != b:
                    raise AssertionError("lossless round-trip failed")

            tc, td = t1 - t0, t2 - t1
            ml.update(
                compressed_length=len(compressed),
                compression_ratio=len(compressed) / original_bytes,
                time_compress=tc * 1000.0,
                time_decompress=td * 1000.0,
                time_total=(tc + td) * 1000.0,
                speed_compress=original_bytes / max(tc, 1e-9) / (1 << 20),
                speed_decompress=original_bytes / max(td, 1e-9) / (1 << 20),
                speed_total=original_bytes / max(tc + td, 1e-9) / (1 << 20),
            )
            if self.distortion is not None:
                self.distortion(decompressed, data)
            if self.task_metric is not None:
                self.task_metric(decompressed, data, sample_idx)

        metrics = ml.get_global_average()
        if self.distortion is not None:
            metrics.update(self.distortion.collect_metrics())
        if self.task_metric is not None:
            metrics.update(self.task_metric.collect_metrics())
        # Per-stage coding profile aggregation (parity: the reference merges
        # per-module profiler results into benchmark metrics,
        # basic_benchmark.py:918-928 / modules/base.py:159-169).
        if hasattr(self.codec, "collect_profile"):
            metrics.update(self.codec.collect_profile(reset=True))
        return metrics


def _mp_worker_run(args):
    """Top-level worker for multiprocessing pools (must be picklable):
    runs one dataset segment through a fresh testing worker."""
    codec, dataset_items, compute_distortion, verify_lossless = args

    class _ListLoader:
        def __init__(self, items):
            self.items = items

        def iterate(self):
            return iter(self.items)

        def get_length(self):
            return len(self.items)

    worker = BenchmarkTestingWorker(
        codec, _ListLoader(dataset_items),
        compute_distortion=compute_distortion,
        verify_lossless=verify_lossless)
    return worker()


def run_parallel_testing(codec, dataloader, num_workers: int = 2,
                         compute_distortion: bool = True,
                         verify_lossless: bool = False) -> Dict[str, float]:
    """CPU multiprocessing over dataset segments (parity: the reference's
    multiprocessing.Pool worker split, basic_benchmark.py:837-858).

    Only for host-side (picklable) codecs — classical PIL/byte codecs; JAX
    codecs hold device state and run in-process instead.
    """
    import multiprocessing as mp

    items = list(dataloader.iterate())
    segments = [items[i::num_workers] for i in range(num_workers)]
    segments = [seg for seg in segments if seg]
    ctx = mp.get_context("spawn")
    with ctx.Pool(len(segments)) as pool:
        results = pool.map(_mp_worker_run, [
            (codec, seg, compute_distortion, verify_lossless)
            for seg in segments])
    # Weighted merge of per-segment global averages.
    merged: Dict[str, float] = {}
    total = sum(len(seg) for seg in segments)
    for seg, res in zip(segments, results):
        for k, v in res.items():
            merged[k] = merged.get(k, 0.0) + v * len(seg) / total
    return merged


class BasicCompressionBenchmark(BaseBenchmark):
    """Main benchmark: optional training, nested testing over
    (task × complexity level × rate level), BD metrics from RD points."""

    def __init__(self, codec: Optional[CodecInterface] = None,
                 dataloader: Optional[DataLoaderInterface] = None,
                 trainer=None,
                 compute_distortion: bool = True,
                 verify_lossless: bool = False,
                 bd_reference_pts=None,
                 bd_mode: int = 1,
                 bpp_pixels: Optional[int] = None,
                 nn_bitlen_estimation: bool = False,
                 task_metrics=None,
                 **kwargs):
        super().__init__(codec=codec, **kwargs)
        # task_metrics: list indexed by the codec's task axis — task t of a
        # VariableTaskCodecInterface codec is evaluated with task_metrics[t]
        # (parity: the reference's per-task metric wiring,
        # basic_benchmark.py task loop + set_task flows).
        self.task_metrics = task_metrics
        self.dataloader = dataloader
        self.trainer = trainer
        self.compute_distortion = compute_distortion
        self.verify_lossless = verify_lossless
        self.bd_reference_pts = bd_reference_pts
        self.bd_mode = bd_mode
        self.bpp_pixels = bpp_pixels
        # Entropy-only evaluation: estimate rate from NN forward likelihoods
        # instead of running the real coder (parity: basic_benchmark.py
        # NN-forward-only bitlen estimation).
        self.nn_bitlen_estimation = nn_bitlen_estimation
        self.metric_2d_rows: List[Dict[str, Any]] = []

    def set_dataloader(self, dataloader: DataLoaderInterface):
        self.dataloader = dataloader

    # -- training ----------------------------------------------------------
    def run_training(self):
        if self.trainer is not None:
            self.trainer.train_module(self.codec)
            return
        # Self-trainable codecs own their trainer (SelfTrainableInterface —
        # parity: the reference benchmark asking SelfTrainableModules to
        # train themselves, modules/base.py).
        from ..codecs.base import SelfTrainableInterface
        if (isinstance(self.codec, SelfTrainableInterface)
                and self.codec.is_trainable):
            self.codec.train_self()

    # -- testing -----------------------------------------------------------
    def _levels(self):
        codec = self.codec
        num_tasks = codec.num_tasks if isinstance(codec, VariableTaskCodecInterface) else 1
        num_sc = (codec.num_complex_levels
                  if isinstance(codec, VariableComplexityCodecInterface) else 1)
        num_vr = (codec.num_rate_levels
                  if isinstance(codec, VariableRateCodecInterface) else 1)
        return num_tasks, num_sc, num_vr

    def run_testing(self) -> Dict[str, Any]:
        codec = self.codec
        codec.update_state()
        num_tasks, num_sc, num_vr = self._levels()
        all_metrics: Dict[str, Any] = {}

        for task in range(num_tasks):
            if isinstance(codec, VariableTaskCodecInterface) and num_tasks > 1:
                codec.set_task(task)
            for sc in range(num_sc):
                if isinstance(codec, VariableComplexityCodecInterface) and num_sc > 1:
                    codec.set_complex_level(sc)
                rd_points: List[tuple] = []
                for vr in range(num_vr):
                    if isinstance(codec, VariableRateCodecInterface) and num_vr > 1:
                        codec.set_rate_level(vr)
                    task_metric = None
                    if self.task_metrics is not None and task < len(
                            self.task_metrics):
                        task_metric = self.task_metrics[task]
                    worker = BenchmarkTestingWorker(
                        codec, self.dataloader,
                        compute_distortion=self.compute_distortion,
                        verify_lossless=self.verify_lossless,
                        task_metric=task_metric)
                    metrics = worker(self.logger)
                    if self.nn_bitlen_estimation and hasattr(
                            codec, "forward_estimate_bitlen"):
                        est = [codec.forward_estimate_bitlen(d) / 8.0
                               for d in self.dataloader.iterate()]
                        metrics["estimated_compressed_length"] = float(
                            np.mean(est))
                    if isinstance(codec, VariableComplexityCodecInterface):
                        metrics.update({
                            f"complex_{k}": v for k, v in
                            codec.get_current_complex_metrics().items()
                            if np.isscalar(v)})
                    prefix = ""
                    if num_tasks > 1:
                        prefix += f"task{task}_"
                    if num_sc > 1:
                        prefix += f"sclevel{sc}_"
                    if num_vr > 1:
                        prefix += f"vrlevel{vr}_"
                    all_metrics.update({prefix + k: v for k, v in metrics.items()})
                    row = dict(task=task, sclevel=sc, vrlevel=vr, **metrics)
                    self.metric_2d_rows.append(row)
                    if "psnr" in metrics:
                        rd_points.append((metrics["compressed_length"], metrics["psnr"]))
                    self.logger.info(f"{prefix or 'test'}: "
                                     + ", ".join(f"{k}={v:.4g}" for k, v in metrics.items()))

                if self.bd_reference_pts is not None and len(rd_points) >= 4:
                    R1 = [p[0] for p in rd_points]
                    Q1 = [p[1] for p in rd_points]
                    R2, Q2 = self.bd_reference_pts
                    key = "bd_rate" if self.bd_mode == 1 else "bd_psnr"
                    prefix = f"sclevel{sc}_" if num_sc > 1 else ""
                    try:
                        all_metrics[prefix + key] = bj_delta(
                            R1, Q1, R2, Q2, mode=self.bd_mode)
                    except Exception:
                        self.logger.warning("bd computation failed")

        self.metric_dict.update(all_metrics)
        self._save_metrics_2d()
        return all_metrics

    def _save_metrics_2d(self):
        if self.output_dir is None or not self.metric_2d_rows:
            return
        keys = sorted({k for row in self.metric_2d_rows for k in row})
        with locked_file(self.output_path("metrics_2d.csv"), "w") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            for row in self.metric_2d_rows:
                w.writerow(row)

    def run_benchmark(self, run_training: bool = True, run_testing: bool = True,
                      seed: Optional[int] = None, **kwargs) -> Dict[str, Any]:
        # Determinism: the CLI --seed flows here (parity: run_benchmark.py
        # seed → pl.seed_everything). Trainer RNG keys and host-side numpy
        # sampling both derive from it.
        if seed is not None:
            np.random.seed(int(seed))
            if self.trainer is not None and hasattr(self.trainer, "seed"):
                self.trainer.seed = int(seed)
        if run_training:
            self.run_training()
        if run_testing:
            self.run_testing()
        self.save_metrics()
        return self.collect_metrics()


class GroupedCodecBenchmark(BaseBenchmark):
    """Run the same benchmark over a list of (name, codec) pairs, each into
    its own subdirectory. Parity: GroupedLosslessCompressionBenchmark +
    GroupedCodecBenchmarkBuilder.run_benchmark flow."""

    def __init__(self, benchmark: BasicCompressionBenchmark,
                 named_codecs: List[tuple], **kwargs):
        super().__init__(**kwargs)
        self.benchmark = benchmark
        self.named_codecs = named_codecs

    def run_benchmark(self, **kwargs) -> Dict[str, Any]:
        results = {}
        for name, codec in self.named_codecs:
            sub = self.benchmark.setup_engine_from_copy(
                output_dir=(self.output_path(name) if self.output_dir else None))
            sub.metric_dict = {}
            sub.metric_2d_rows = []
            sub.set_codec(codec)
            metrics = sub.run_benchmark(**kwargs)
            results[name] = metrics
        self.metric_dict.update(
            {f"{n}_{k}": v for n, m in results.items() for k, v in m.items()})
        self.save_metrics()
        return results
