#!/usr/bin/env python
"""Launch TensorBoard with experiment-name-labeled log dirs.

Parity: reference tools/run_tensorboard_with_name.py — walks the
experiment output tree, reads each run's experiment name (first line of
the name file: config_name.txt here, exp_name.txt in the reference —
written by tools/run_benchmark.py) and builds a ``--logdir_spec
"(hash)name":dir`` mapping so the TB sidebar shows config names instead
of hash directories.

Usage: python tools/run_tensorboard_with_name.py -l experiments
Use --print-only to emit the command without executing tensorboard
(tensorboard is not baked into this image; the spec also works with any
external TB install pointed at the same tree).
"""

import argparse
import os
import subprocess
import sys


def build_logdir_spec(log_dir: str,
                      config_filename: str = "config_name.txt") -> str:
    specs = []
    for dirpath, _subdirs, files in os.walk(log_dir):
        if os.path.abspath(dirpath) == os.path.abspath(log_dir):
            continue
        name_file = (config_filename if config_filename in files
                     else "exp_name.txt" if "exp_name.txt" in files
                     else None)
        if name_file is None:
            continue
        with open(os.path.join(dirpath, name_file)) as f:
            exp_name = f.readline().strip()
        if exp_name:
            tag = f"({os.path.basename(dirpath)[:8]}){exp_name}"
            specs.append(f"{tag}:{dirpath}")
    return ",".join(specs)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--logdir", "-l", default="experiments")
    p.add_argument("--config-filename", "-c", default="config_name.txt")
    p.add_argument("--print-only", action="store_true")
    args = p.parse_args(argv)

    spec = build_logdir_spec(args.logdir, args.config_filename)
    if not spec:
        print(f"no named experiment dirs under {args.logdir}",
              file=sys.stderr)
        return 1
    cmd = ["tensorboard", "--logdir_spec", spec]
    print("Running:", " ".join(cmd))
    if args.print_only:
        return 0
    return subprocess.call(cmd)


if __name__ == "__main__":
    sys.exit(main())
