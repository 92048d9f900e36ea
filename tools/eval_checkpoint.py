#!/usr/bin/env python
"""Evaluate a bundled checkpoint on the held-out region (true bitstreams).

Loads weights via ``cbench_basic_tpu.utils.pretrained``, rebuilds the
flagship codec, and runs the exact train_flagship held-out protocol (last
bundled photo, top-left ``--eval-size`` crop — disjoint from training) at
every trained rate level. Used to verify a freshly bundled fp16 cast
reproduces the fp32 training-run eval.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--name", default=None,
                   help="registry name (default: best available)")
    p.add_argument("--eval-size", type=int, default=448)
    args = p.parse_args()

    import jax

    from cbench_basic_tpu.data import BundledPhotoDataset
    from cbench_basic_tpu.utils import pretrained
    from tools.train_flagship import evaluate

    name = args.name or pretrained.best_checkpoint()
    if name is None:
        raise SystemExit("no bundled checkpoint available")
    print("devices:", jax.devices(), " checkpoint:", name, flush=True)

    full = BundledPhotoDataset(align=64)
    last = full.get_data_at(len(full) - 1)
    held = last[:args.eval_size, :args.eval_size]

    codec = pretrained.load_flagship_codec(name)
    lams = pretrained.rate_lambdas(name)
    levels = []
    for lvl in range(len(lams) if lams else 1):
        if lams:
            codec.set_rate_level(lvl)
        codec.update_state()
        ev = evaluate(codec, held)
        ev["rate_level"] = lvl
        if lams:
            ev["lmbda"] = lams[lvl]
        print(f"level {lvl}: {ev['bpp']:.4f} bpp, {ev['psnr']:.2f} dB, "
              f"ms-ssim {ev['ms_ssim']}", flush=True)
        levels.append(ev)
    print(json.dumps({"checkpoint": name, "eval_size": args.eval_size,
                      "platform": jax.devices()[0].platform,
                      "levels": levels}))


if __name__ == "__main__":
    main()
