#!/usr/bin/env python
"""Pack a directory of files into a numpy structured-records table.

Parity: reference tools/directory_to_pdrecords.py — reads every file in a
directory as raw bytes and saves a single-column records array consumable
by the pandas-table dataset (configs/datasets/pandas_table/*,
cbench_basic_tpu/data/extra_datasets.py PandasTableDataset). Deterministic
file order (sorted) so record indices are stable across hosts, unlike the
reference's os.listdir order.

Usage: python tools/directory_to_pdrecords.py <dir> <out.npy>
"""

import argparse
import os
import sys

import numpy as np


def pack_directory(directory: str, outfile: str, verbose: bool = True) -> int:
    data = []
    for fname in sorted(os.listdir(directory)):
        path = os.path.join(directory, fname)
        if not os.path.isfile(path):
            continue
        if verbose:
            print(f"Adding {fname}")
        with open(path, "rb") as f:
            data.append(f.read())
    try:
        import pandas as pd

        records = pd.DataFrame(data=data).to_records(index=False)
    except ImportError:  # pandas-free fallback: same '0' field name/layout
        records = np.rec.fromarrays([np.array(data, dtype=object)],
                                    names=["0"])
    np.save(outfile, records, allow_pickle=True)
    if verbose:
        print(f"Wrote {len(data)} records to {outfile}")
    return len(data)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("directory")
    p.add_argument("outfile")
    args = p.parse_args(argv)
    if pack_directory(args.directory, args.outfile) == 0:
        print("warning: no files packed", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
