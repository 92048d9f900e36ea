#!/usr/bin/env python
"""Prepare training image subsets (parity: reference
tools/prepare_dataset.py, the QRAF ImageNet-subset recipe): select the
first/random N images from a source directory, center-crop/resize to a
minimum size, and write PNGs into the output dir.
"""

import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="source image directory")
    p.add_argument("dst", help="output directory")
    p.add_argument("--num", type=int, default=8000)
    p.add_argument("--min-size", type=int, default=256,
                   help="skip images smaller than this on either side")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shuffle", action="store_true")
    args = p.parse_args()

    from PIL import Image

    exts = {".png", ".jpg", ".jpeg", ".bmp", ".webp", ".ppm"}
    files = sorted(
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(args.src)
        for f in fn if os.path.splitext(f)[1].lower() in exts)
    if args.shuffle:
        random.Random(args.seed).shuffle(files)

    os.makedirs(args.dst, exist_ok=True)
    kept = 0
    for path in files:
        if kept >= args.num:
            break
        try:
            img = Image.open(path).convert("RGB")
        except Exception:
            continue
        if min(img.size) < args.min_size:
            continue
        img.save(os.path.join(args.dst, f"{kept:06d}.png"))
        kept += 1
    print(f"prepared {kept} images in {args.dst}")


if __name__ == "__main__":
    main()
