#!/usr/bin/env python
"""Merge repeated runs of the same experiment into mean/std summary rows
(parity: reference tools/collect_repeat_results.py).

Repeats are experiment directories whose names differ only by a trailing
repeat tag (``_r<k>``, ``_repeat<k>`` or ``/<k>``); numeric metrics are
aggregated into ``<key>_mean`` / ``<key>_std`` with a ``num_repeats``
column.
"""

import argparse
import csv
import math
import os
import re

from collect_results import collect

_REPEAT_RE = re.compile(r"(?:[_-](?:r|rep|repeat)?\d+)$")


def repeat_group(name: str) -> str:
    base = _REPEAT_RE.sub("", name)
    return base or name


def merge_repeats(rows):
    groups = {}
    for row in rows:
        groups.setdefault(repeat_group(row["experiment"]), []).append(row)
    merged = []
    for base, members in sorted(groups.items()):
        out = {"experiment": base, "num_repeats": len(members)}
        keys = {k for m in members for k in m} - {"experiment"}
        for k in sorted(keys):
            vals = []
            for m in members:
                try:
                    vals.append(float(m[k]))
                except (KeyError, ValueError, TypeError):
                    pass
            if not vals:
                continue
            mean = sum(vals) / len(vals)
            var = sum((v - mean) ** 2 for v in vals) / len(vals)
            out[f"{k}_mean"] = mean
            out[f"{k}_std"] = math.sqrt(var)
        merged.append(out)
    return merged


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", nargs="?", default="experiments")
    p.add_argument("--output", "-o", default=None)
    args = p.parse_args()

    rows = collect(args.root)
    if not rows:
        print(f"no metrics.csv found under {args.root}")
        return
    merged = merge_repeats(rows)
    keys = sorted({k for r in merged for k in r})
    keys = (["experiment", "num_repeats"]
            + [k for k in keys if k not in ("experiment", "num_repeats")])
    out = args.output or os.path.join(args.root, "repeat_results.csv")
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(merged)
    print(f"wrote {len(merged)} merged experiments to {out}")


if __name__ == "__main__":
    main()
