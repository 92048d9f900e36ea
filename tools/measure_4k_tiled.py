#!/usr/bin/env python
"""Time 4K tiled inference on trained weights (BASELINE.json config 5).

Builds a >= 4096x2160 image as a mosaic of the bundled real photos (zero
egress: no 4K source exists, but the mosaic has true photographic
statistics everywhere), wraps the bundled trained flagship in TiledCodec
(batched mode: one fused device dispatch per tile-size group), and
measures the true bitstream round trip: MP/s, bpp, PSNR.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mosaic_4k(height=4160, width=4096):
    import numpy as np
    from cbench_basic_tpu.data import BundledPhotoDataset
    ds = BundledPhotoDataset(align=1)
    photos = [ds.get_data_at(i) for i in range(len(ds))]
    out = np.zeros((height, width, 3), np.uint8)
    rng = np.random.default_rng(0)
    y = 0
    i = 0
    while y < height:
        x = 0
        row_h = 0
        while x < width:
            p = photos[i % len(photos)]
            if i % 2:  # vary orientation so tile stats differ
                p = p[::-1, ::-1]
            ph, pw = p.shape[:2]
            th = min(ph, height - y)
            tw = min(pw, width - x)
            oy = rng.integers(0, ph - th + 1)
            ox = rng.integers(0, pw - tw + 1)
            out[y:y + th, x:x + tw] = p[oy:oy + th, ox:ox + tw]
            x += tw
            row_h = max(row_h, th)
            i += 1
        y += row_h
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--height", type=int, default=4160)
    p.add_argument("--width", type=int, default=4096)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--rate-level", type=int, default=-1,
                   help="-1 = highest trained rate level")
    args = p.parse_args()

    import jax
    import numpy as np

    from cbench_basic_tpu.bench.metrics import BatchedImageDistortion
    from cbench_basic_tpu.codecs.tiled import TiledCodec
    from cbench_basic_tpu.utils import pretrained

    name = pretrained.best_checkpoint()
    if name is None:
        raise SystemExit("no bundled checkpoint available")
    print("devices:", jax.devices(), " checkpoint:", name, flush=True)
    inner = pretrained.load_flagship_codec(name)
    lams = pretrained.rate_lambdas(name)
    if lams:
        lvl = args.rate_level % len(lams)
        inner.set_rate_level(lvl)
        print(f"rate level {lvl} (lambda={lams[lvl]})", flush=True)
    inner.update_state()
    codec = TiledCodec(inner, tile=args.tile, batched=True)

    img = mosaic_4k(args.height, args.width)
    npix = img.shape[0] * img.shape[1]
    print(f"image {img.shape[1]}x{img.shape[0]} ({npix/1e6:.2f} MP), "
          f"tile {args.tile}", flush=True)

    # warmup/compile
    rec = codec.decompress(codec.compress(img))
    assert rec.shape == img.shape

    encs, decs, sizes = [], [], []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        stream = codec.compress(img)
        encs.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        rec = codec.decompress(stream)
        decs.append(time.perf_counter() - t0)
        sizes.append(len(stream))
    enc = sorted(encs)[len(encs) // 2]
    dec = sorted(decs)[len(decs) // 2]
    # distortion on the host CPU device: a 17 MP jitted MS-SSIM needs
    # ~16 GB of HBM temporaries (> v5e capacity) and is not the thing
    # being timed here anyway.
    with jax.default_device(jax.devices("cpu")[0]):
        m = BatchedImageDistortion(compute_ms_ssim=True)(rec, img)
    result = {
        "height": img.shape[0], "width": img.shape[1], "tile": args.tile,
        "bpp": sizes[-1] * 8 / npix,
        "psnr": m["psnr"], "ms_ssim": m.get("ms_ssim"),
        "enc_s": enc, "dec_s": dec,
        "enc_mps": npix / enc / 1e6, "dec_mps": npix / dec / 1e6,
        "rt_mps": npix / (enc + dec) / 1e6,
        "platform": jax.devices()[0].platform,
        "checkpoint": name,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
