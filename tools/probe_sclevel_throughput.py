#!/usr/bin/env python
"""Device coding throughput per complexity level (sclevel).

The computational-scalability contract (reference
cbench/modules/latent_graph.py:1397-1641 greedy search + SlimCAE-style
slimmable widths) promises that lower complexity levels trade rate/quality
for SPEED. docs/artifacts/scalable_r4 proved the rate/quality axis on
trained weights; this probe measures the speed axis: device-only fused
encode/decode throughput (inputs resident, outputs undownloaded) at every
searched sclevel of the scalable codec.

Throughput is weight-independent, so the codec is random-init; the
per-edge width tables default to the searched levels committed in
docs/artifacts/scalable_r4/scalable_result.json.

Prints one JSON line per sclevel + a summary line (consumed by
docs/performance.md "per-sclevel device throughput" table).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "artifacts", "scalable_r4",
    "scalable_result.json")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", type=int, default=6,
                   help="batch size (>= 2: the device-timing probes need "
                        "the batched stream mode)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--widths", default="32,64,96")
    p.add_argument("--N", type=int, default=96)
    p.add_argument("--M", type=int, default=96)
    p.add_argument("--levels-json", default=ARTIFACT,
                   help="scalable_result.json holding searched_levels")
    args = p.parse_args()
    if args.images < 2:
        p.error("--images must be >= 2 (single images take the "
                "per-image stream path, which the device timing probes "
                "cannot read)")

    import jax

    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.data import SyntheticImageDataset
    from cbench_basic_tpu.graph.builders import build_basic_scalable_graph

    with open(args.levels_json) as f:
        searched = json.load(f)["searched_levels"][0]

    h, w = 512, 768
    ds = SyntheticImageDataset(num_items=args.images, height=h, width=w)
    imgs = [ds.get_data_at(i) for i in range(args.images)]
    total_pixels = sum(im.shape[0] * im.shape[1] for im in imgs)

    widths = tuple(int(v) for v in args.widths.split(","))
    model, specs, levels = build_basic_scalable_graph(
        N=args.N, M=args.M, lmbda=0.0067, widths=widths, pattern="elic",
        num_channel_groups=5, context_channels=2 * args.M)
    codec = LatentGraphCodec(model, specs, complexity_levels=searched,
                             coding_mode="tpu", num_lanes=2048)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    codec.update_state()

    results = []
    for sc in range(codec.num_complex_levels):
        codec.set_complex_level(sc)
        stream = codec.compress_batch(imgs)  # warmup/compile this level
        recs = codec.decompress_batch(stream)
        assert recs[0].shape == imgs[0].shape
        dec_s = codec.time_device_decode_batch(stream, iters=args.iters)
        enc_s = codec.time_device_encode_batch(imgs, iters=args.iters)
        row = {
            "sclevel": sc,
            "edge_widths": {k: widths[v] for k, v in searched[sc].items()},
            "bpp": round(len(stream) * 8 / total_pixels, 4),
            "device_encode_mpps": round(total_pixels / enc_s / 1e6, 2),
            "device_decode_mpps": round(total_pixels / dec_s / 1e6, 2),
            "device_roundtrip_mpps": round(
                total_pixels / (enc_s + dec_s) / 1e6, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
