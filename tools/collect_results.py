#!/usr/bin/env python
"""Walk an experiments directory and merge all metrics.csv files into one
summary CSV (parity: reference tools/collect_results.py:6-29)."""

import argparse
import csv
import os


def collect(root: str):
    rows = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if "metrics.csv" in filenames:
            path = os.path.join(dirpath, "metrics.csv")
            with open(path) as f:
                metrics = {r[0]: r[1] for r in csv.reader(f) if len(r) >= 2}
            metrics["experiment"] = os.path.relpath(dirpath, root)
            rows.append(metrics)
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", nargs="?", default="experiments")
    p.add_argument("--output", "-o", default=None)
    args = p.parse_args()

    rows = collect(args.root)
    if not rows:
        print(f"no metrics.csv found under {args.root}")
        return
    keys = ["experiment"] + sorted({k for r in rows for k in r} - {"experiment"})
    out = args.output or os.path.join(args.root, "all_results.csv")
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} experiments to {out}")


if __name__ == "__main__":
    main()
