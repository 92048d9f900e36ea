#!/usr/bin/env python
"""Bundle a trainer ``params.pkl`` into ``checkpoints/`` (fp16 + xz).

The repo ships self-trained weights (zero egress — no downloadable zoo;
reference analog: the ``configs/pretrained`` download entries). Bundled
checkpoints are fp16-cast, xz-compressed pickles of the trainer's
``params.pkl`` payload; ``cbench_basic_tpu.utils.pretrained`` restores
fp32 at load. After bundling, add/update the REGISTRY entry there.
"""
import argparse
import lzma
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cast_fp16(tree):
    if isinstance(tree, dict):
        return {k: cast_fp16(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(cast_fp16(v) for v in tree)
    a = np.asarray(tree)
    if a.dtype == np.float32 or a.dtype == np.float64:
        return a.astype(np.float16)
    return a


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("params_pkl", help="trainer params.pkl path")
    p.add_argument("name", help="checkpoint name (file becomes "
                                "checkpoints/<name>.fp16.pkl.xz)")
    p.add_argument("--preset", type=int, default=6,
                   help="xz preset (6 is a good size/time tradeoff)")
    args = p.parse_args()

    from cbench_basic_tpu.utils.pretrained import CHECKPOINT_DIR

    with open(args.params_pkl, "rb") as f:
        payload = pickle.load(f)
    tree = payload["params"] if (isinstance(payload, dict)
                                 and "params" in payload) else payload
    out_payload = dict(payload) if isinstance(payload, dict) else {}
    out_payload["params"] = cast_fp16(tree)

    os.makedirs(CHECKPOINT_DIR, exist_ok=True)
    out = os.path.join(CHECKPOINT_DIR, f"{args.name}.fp16.pkl.xz")
    with lzma.open(out, "wb", preset=args.preset) as f:
        pickle.dump(out_payload, f)
    print(f"{out}: {os.path.getsize(out) / 1e6:.1f} MB "
          f"(from {os.path.getsize(args.params_pkl) / 1e6:.1f} MB fp32)")


if __name__ == "__main__":
    main()
