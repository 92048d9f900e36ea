#!/usr/bin/env python
"""Collect a trained flagship RD curve and score BD-rate vs JPEG/WebP.

Companion to tools/train_flagship.py: after training one flagship model
per λ (each run leaves `flagship_result.json` with the held-out
(bpp, psnr) point), this tool assembles the RD curve, sweeps the PIL
JPEG/WebP anchors over the SAME held-out crop, and reports BD-rate /
BD-PSNR via the repo's Bjøntegaard implementation (bench/metrics.py —
parity with the reference's bj_delta.py metric that
configs/lossy_graph_scalable_exp.py wires into every scalable
experiment).

Positive BD-rate = the anchor needs that much more rate than the
flagship at equal PSNR (i.e. positive means we beat the anchor).
"""
import argparse
import glob
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def msssim_db(q):
    """MS-SSIM mapped to the usual log domain for BD integration:
    -10*log10(1 - MS-SSIM). BD deltas over raw MS-SSIM are dominated by
    the saturated top of the curve; the dB mapping is the standard fix
    (used by e.g. CompressAI's result plots)."""
    return -10.0 * np.log10(np.maximum(1.0 - np.asarray(q, float), 1e-10))


def anchor_curve(img: np.ndarray, fmt: str, with_ms_ssim: bool = False):
    """(bpp[], psnr[][, ms_ssim[]]) over the PIL quality sweep on `img`."""
    from PIL import Image
    if with_ms_ssim:
        from cbench_basic_tpu.bench.metrics import BatchedImageDistortion
        dist = BatchedImageDistortion(compute_ms_ssim=True)
    npix = img.shape[0] * img.shape[1]
    rates, quals, msq = [], [], []
    for q in (5, 10, 15, 20, 30, 40, 50, 60, 70, 80, 90, 95):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format=fmt, quality=q)
        rec = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
        mse = np.mean((rec.astype(np.float64) - img.astype(np.float64)) ** 2)
        rates.append(len(buf.getvalue()) * 8 / npix)
        quals.append(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))
        if with_ms_ssim:
            msq.append(float(dist(rec, img)["ms_ssim"]))
    if with_ms_ssim:
        return rates, quals, msq
    return rates, quals


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs-dir", default="/tmp/flagship_rd")
    p.add_argument("--eval-size", type=int, default=448,
                   help="must match the --eval-size the runs used")
    args = p.parse_args()

    pts = []
    for f in sorted(glob.glob(os.path.join(args.runs_dir, "*",
                                           "flagship_result.json"))
                    + glob.glob(os.path.join(args.runs_dir,
                                             "flagship_result.json"))):
        with open(f) as fh:
            r = json.load(fh)
        if "heldout_levels" in r:
            # one variable-rate model: every trained level is an RD point
            for ev in r["heldout_levels"]:
                pts.append((ev["lmbda"], ev["bpp"], ev["psnr"],
                            ev.get("ms_ssim")))
        elif "heldout" in r:
            pts.append((r["lmbda"], r["heldout"]["bpp"],
                        r["heldout"]["psnr"], r["heldout"].get("ms_ssim")))
    if len(pts) < 2:
        raise SystemExit(f"need >=2 RD points under {args.runs_dir}, "
                         f"got {len(pts)}")
    pts.sort(key=lambda t: t[1])
    lmbdas = [t[0] for t in pts]
    rates = [t[1] for t in pts]
    psnrs = [t[2] for t in pts]
    msssims = [t[3] for t in pts]
    have_msssim = all(m is not None for m in msssims)

    from cbench_basic_tpu.bench.metrics import bj_delta
    from cbench_basic_tpu.data import BundledPhotoDataset

    full = BundledPhotoDataset(align=64)
    held = full.get_data_at(full.get_length() - 1)
    if args.eval_size:
        held = held[:args.eval_size, :args.eval_size]

    print(f"flagship RD curve on held-out {held.shape[1]}x{held.shape[0]} "
          f"photo ({len(pts)} points):")
    for lm, r, q, ms in pts:
        tail = f"  ms-ssim {ms:.4f}" if ms is not None else ""
        print(f"  lambda={lm:<8} {r:6.3f} bpp  {q:6.2f} dB{tail}")

    result = {"heldout_shape": list(held.shape),
              "lambda": lmbdas, "bpp": rates, "psnr": psnrs,
              "ms_ssim": msssims if have_msssim else None, "anchors": {}}
    # BD needs >=2 points per curve and an overlapping quality range; the
    # cubic polyfit inside bj_delta wants 4 — our curves have exactly 4.
    for fmt in ("JPEG", "WEBP"):
        if have_msssim:
            ar, aq, ams = anchor_curve(held, fmt, with_ms_ssim=True)
        else:
            ar, aq = anchor_curve(held, fmt)
        # Restrict the anchor sweep to the flagship's quality span so the
        # integration interval is the real overlap, not extrapolation.
        lo, hi = min(psnrs) - 1.0, max(psnrs) + 1.0
        keep = [i for i, q in enumerate(aq) if lo <= q <= hi]
        if len(keep) < 4:
            keep = list(range(len(aq)))
        ar_k = [ar[i] for i in keep]
        aq_k = [aq[i] for i in keep]
        bd_rate = bj_delta(rates, psnrs, ar_k, aq_k, mode=1)
        bd_psnr = bj_delta(rates, psnrs, ar_k, aq_k, mode=0)
        result["anchors"][fmt.lower()] = {
            "bpp": ar_k, "psnr": aq_k,
            "bd_rate_pct": bd_rate, "bd_psnr_db": bd_psnr}
        verdict = "flagship BETTER" if bd_rate > 0 else "anchor better"
        print(f"vs {fmt}: BD-rate {bd_rate:+.1f}% (positive = {fmt} needs "
              f"more rate), BD-PSNR {bd_psnr:+.2f} dB -> {verdict}")
        if have_msssim:
            # MS-SSIM BD in the -10log10(1-q) dB domain (own keep-window:
            # the PSNR window can exclude the MS-SSIM overlap).
            tq = msssim_db(msssims)
            aq_ms = msssim_db(ams)
            lo_m, hi_m = tq.min() - 0.5, tq.max() + 0.5
            keep_m = [i for i, q in enumerate(aq_ms) if lo_m <= q <= hi_m]
            if len(keep_m) < 4:
                keep_m = list(range(len(aq_ms)))
            ar_m = [ar[i] for i in keep_m]
            aq_m = [aq_ms[i] for i in keep_m]
            bd_rate_ms = bj_delta(rates, list(tq), ar_m, aq_m, mode=1)
            bd_q_ms = bj_delta(rates, list(tq), ar_m, aq_m, mode=0)
            result["anchors"][fmt.lower()].update(
                ms_ssim=[ams[i] for i in keep_m],
                bd_rate_msssim_pct=bd_rate_ms, bd_msssim_db=bd_q_ms)
            verdict = "flagship BETTER" if bd_rate_ms > 0 else "anchor better"
            print(f"vs {fmt} [MS-SSIM]: BD-rate {bd_rate_ms:+.1f}%, "
                  f"BD-quality {bd_q_ms:+.2f} dB(-10log10(1-q)) "
                  f"-> {verdict}")

    out = os.path.join(args.runs_dir, "rd_curve.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({"points": len(pts),
                      "bd_rate_vs_jpeg": result["anchors"]["jpeg"]["bd_rate_pct"],
                      "bd_rate_vs_webp": result["anchors"]["webp"]["bd_rate_pct"]}))


if __name__ == "__main__":
    main()
