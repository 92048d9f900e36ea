#!/usr/bin/env python
"""Device coding throughput vs interleaved-rANS lane count.

The fused TPU decode is a lax.scan whose per-step cost is dominated by
fixed gather/dispatch overheads, so throughput should scale close to
linearly with lane width until the VPU saturates. The rans32 lane format
(32-bit states, u16 renorm words — coding/csrc/anscoder.cpp
rans32_*_interleaved) made wide lane sets cheap: 4 flush bytes per lane
instead of 8, so doubling lanes costs ~0.4% rate on a Kodak-size batch
versus the +12% the rans64 format measured in round 2
(docs/performance.md "tried and rejected").

Prints one JSON line per lane count: device-only encode/decode MP/s
(inputs resident, outputs undownloaded) + bpp, plus an e2e round trip.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lanes", default="2048,4096,8192")
    p.add_argument("--images", type=int, default=6)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--unrolls", default=None,
                   help="comma list of CBT_DECODE_UNROLL values to sweep "
                        "per lane count (each forces a decode re-trace)")
    args = p.parse_args()

    import jax

    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.data import SyntheticImageDataset
    from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph

    h, w = 512, 768
    ds = SyntheticImageDataset(num_items=args.images, height=h, width=w)
    imgs = [ds.get_data_at(i) for i in range(args.images)]
    total_pixels = sum(im.shape[0] * im.shape[1] for im in imgs)

    model, specs = build_topogroup_hyperprior_graph(
        N=192, M=192, pattern="elic", num_channel_groups=5,
        context_channels=384)

    results = []
    unrolls = ([int(v) for v in args.unrolls.split(",")]
               if args.unrolls else [None])
    combos = [(lanes, u) for lanes in
              (int(v) for v in args.lanes.split(",")) for u in unrolls]
    for lanes, unroll in combos:
        if unroll is not None:
            os.environ["CBT_DECODE_UNROLL"] = str(unroll)
        codec = LatentGraphCodec(model, specs, coding_mode="tpu",
                                 num_lanes=lanes)
        codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
        codec.update_state()
        stream = codec.compress_batch(imgs)   # warmup/compile
        recs = codec.decompress_batch(stream)
        assert recs[0].shape == imgs[0].shape
        if stream[0] != codec.MODE_TPU_BATCH:
            print(json.dumps({"lanes": lanes, "error": "host fallback"}))
            continue
        t0 = time.perf_counter()
        codec.decompress_batch(codec.compress_batch(imgs))
        e2e = total_pixels / (time.perf_counter() - t0) / 1e6
        dec_s = codec.time_device_decode_batch(stream, iters=args.iters)
        enc_s = codec.time_device_encode_batch(imgs, iters=args.iters)
        row = {
            "lanes": lanes,
            "unroll": unroll,
            "bpp": round(len(stream) * 8 / total_pixels, 4),
            "device_encode_mpps": round(total_pixels / enc_s / 1e6, 2),
            "device_decode_mpps": round(total_pixels / dec_s / 1e6, 2),
            "device_roundtrip_mpps": round(
                total_pixels / (enc_s + dec_s) / 1e6, 2),
            "e2e_mpps": round(e2e, 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
