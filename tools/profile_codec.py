#!/usr/bin/env python
"""Per-stage coding profile of a codec config.

Builds a codec from a sub-config file (or the flagship default), runs N
warm rounds of compress/decompress (per-image and, where supported,
batched), and prints the profiler's stage breakdown — the counterpart of
docs/performance.md's table for diagnosing where a deployment's time goes
(tunnel transfers vs device passes vs host rANS).

Usage:
  python tools/profile_codec.py [config.py] [--images N] [--size HxW]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None,
                   help="codec sub-config .py (default: flagship topogroup)")
    p.add_argument("--images", type=int, default=4)
    p.add_argument("--size", default="512x768")
    p.add_argument("--lanes", type=int, default=2048)
    p.add_argument("--rans-bits", type=int, default=32, choices=(32, 64),
                   help="TPU lane-stream format (32 = v2 fast path)")
    p.add_argument("--device-only", action="store_true",
                   help="also time the fused device passes with inputs "
                        "device-resident (time_device_{encode,decode}_batch)")
    p.add_argument("--per-sclevel", action="store_true",
                   help="repeat the device-only probes at every complexity "
                        "level (slimmable codecs: slimmer must be faster)")
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler device trace of the "
                        "measured rounds into this directory (open with "
                        "tensorboard / xprof; the TPU-native analog of the "
                        "reference's per-module profilers, "
                        "cbench/utils/logging_utils.py:126-133)")
    args = p.parse_args()

    import jax

    from cbench_basic_tpu.data import SyntheticImageDataset

    h, w = (int(x) for x in args.size.split("x"))

    if args.config:
        from cbench_basic_tpu.config.import_utils import import_config_from_file
        codec = import_config_from_file(args.config).build_class()
    else:
        from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
        from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph
        model, specs = build_topogroup_hyperprior_graph(
            N=192, M=192, pattern="elic", num_channel_groups=5,
            context_channels=384)
        codec = LatentGraphCodec(model, specs, coding_mode="tpu",
                                 num_lanes=args.lanes,
                                 rans_bits=args.rans_bits)
        codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    codec.update_state()

    ds = SyntheticImageDataset(num_items=args.images, height=h, width=w)
    imgs = [ds.get_data_at(i) for i in range(args.images)]

    print(f"platform: {jax.devices()[0].platform}  images: {args.images} "
          f"@ {h}x{w}")

    # per-image mode
    codec.decompress(codec.compress(imgs[0]))  # warmup/compile
    if hasattr(codec, "collect_profile"):
        codec.collect_profile()
    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    for img in imgs:
        codec.decompress(codec.compress(img))
    per_image = time.perf_counter() - t0
    print(f"\nper-image mode: {per_image:.3f}s total "
          f"({args.images * h * w / per_image / 1e6:.2f} MP/s)")
    if hasattr(codec, "collect_profile"):
        for k, v in sorted(codec.collect_profile().items()):
            print(f"  {k}: {v:.3f}s")

    # batched mode
    if hasattr(codec, "compress_batch"):
        codec.decompress_batch(codec.compress_batch(imgs))  # warmup
        codec.collect_profile()
        t0 = time.perf_counter()
        codec.decompress_batch(codec.compress_batch(imgs))
        batched = time.perf_counter() - t0
        print(f"\nbatched mode: {batched:.3f}s total "
              f"({args.images * h * w / batched / 1e6:.2f} MP/s)")
        for k, v in sorted(codec.collect_profile().items()):
            print(f"  {k}: {v:.3f}s")

    if args.trace_dir:
        jax.profiler.stop_trace()
        print(f"\ndevice trace written to {args.trace_dir}")

    mp = args.images * h * w / 1e6

    def device_probe(tag):
        stream = codec.compress_batch(imgs)
        t_enc = codec.time_device_encode_batch(imgs)
        t_dec = codec.time_device_decode_batch(stream)
        rt = 1.0 / (1.0 / (mp / t_enc) + 1.0 / (mp / t_dec))
        print(f"{tag}: device encode {mp / t_enc:.1f} MP/s "
              f"({t_enc:.3f}s), decode {mp / t_dec:.1f} MP/s ({t_dec:.3f}s), "
              f"round trip {rt:.1f} MP/s; stream {len(stream)} B")

    if args.device_only and hasattr(codec, "time_device_decode_batch"):
        device_probe(f"\ndevice-only (rans{args.rans_bits}, "
                     f"{codec.num_lanes} lanes)")

    if args.per_sclevel and getattr(codec, "num_complex_levels", 0) > 1:
        print(f"\nper-sclevel device probes ({codec.num_complex_levels} "
              f"levels):")
        for lvl in range(codec.num_complex_levels):
            codec.set_complex_level(lvl)
            device_probe(f"  sclevel {lvl}")


if __name__ == "__main__":
    main()
