#!/usr/bin/env python
"""Benchmark CLI — the framework's single entry point for train/val/test.

Parity: reference tools/run_benchmark.py:398-430 (config file → build →
run_benchmark, with seed / force-restart / train-only / test-only flags,
experiment-name derivation with hash trimming, config pickling for
reproduction).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cbench_basic_tpu.config import import_config_from_file  # noqa: E402


def run_config(config, args) -> dict:
    exp_name = args.name
    if exp_name is None:
        exp_name = (config.get_name_under_limit(name_length_limit=64)
                    if hasattr(config, "get_name_under_limit")
                    else getattr(config, "name", "experiment"))
    # Repeated-run support (parity: reference run_benchmark.py:122-125):
    # each repeat lands in its own suffixed dir with an offset seed;
    # collect_repeat_results.py aggregates them into mean/std rows.
    repeat_idx = getattr(args, "repeat_idx", 0)
    if repeat_idx > 0:
        exp_name = f"{exp_name}_repeat{repeat_idx}"
    output_dir = os.path.join(args.output_dir, exp_name)
    os.makedirs(output_dir, exist_ok=True)

    metrics_file = os.path.join(output_dir, "metrics.csv")
    if os.path.exists(metrics_file) and not args.force_restart:
        print(f"metrics exist at {metrics_file}; skipping (use --force-restart)")
        return {}

    with open(os.path.join(output_dir, "config_name.txt"), "w") as f:
        f.write(getattr(config, "name", exp_name))
    try:
        with open(os.path.join(output_dir, "config.pkl"), "wb") as f:
            pickle.dump(config, f)
    except Exception:
        pass  # non-picklable configs (closures) are fine; name file suffices

    benchmark = config.build_class(output_dir=output_dir)
    metrics = benchmark.run_benchmark(
        run_training=not args.test_only,
        run_testing=not args.train_only,
        seed=args.seed + repeat_idx,
    )
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", nargs="+", help="config .py file(s) defining `config`")
    p.add_argument("--output-dir", "-o", default="experiments")
    p.add_argument("--name", default=None, help="override experiment name")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--force-restart", action="store_true")
    p.add_argument("--train-only", action="store_true")
    p.add_argument("--test-only", action="store_true")
    p.add_argument("--repeat-idx", "-ri", type=int, default=0,
                   help="repeat index: suffixes the experiment dir "
                        "(_repeat<i>) and offsets the seed; merge runs "
                        "with tools/collect_repeat_results.py")
    args = p.parse_args(argv)

    for cfg_path in args.config:
        config = import_config_from_file(cfg_path)
        # Slot sweeps: a config file may produce a ClassBuilderList (e.g.
        # from batch_update_slot_params) — run every swept combination into
        # its own experiment directory (parity: the reference's cartesian
        # slot-sweep experiment files).
        builders = (list(config)
                    if isinstance(config, (list, tuple)) or (
                        hasattr(config, "builders") and hasattr(config, "__iter__"))
                    else [config])
        sweep = len(builders) > 1
        for i, builder in enumerate(builders):
            sub_args = args
            if sweep and args.name is not None:
                sub_args = argparse.Namespace(**vars(args))
                sub_args.name = f"{args.name}_{i}"
            metrics = run_config(builder, sub_args)
            for k, v in sorted(metrics.items()):
                if isinstance(v, float):
                    print(f"{k}: {v:.6g}")
                else:
                    print(f"{k}: {v}")


if __name__ == "__main__":
    main()
