#!/usr/bin/env python
"""Bundle + evaluate + BD-score a flagship training run in one shot.

Endgame companion to tools/train_flagship.py for long schedules that get
stopped mid-run (the trainer checkpoints every ``--ckpt-every`` epochs,
so a killed run loses at most that many steps): takes the run dir's
``params.pkl`` (graceful finish) or ``last_ckpt.pkl`` (killed run),
strips the optimizer state, bundles the weights fp16+xz into
``checkpoints/<name>.fp16.pkl.xz``, re-evaluates every trained rate
level on the held-out region THROUGH THE TRUE BITSTREAM PATH from the
fp16-restored weights, sweeps the JPEG/WebP anchors on the same pixels,
and writes ``checkpoints/<name>.result.json`` in the same shape as the
bundled-zoo result files (BD convention: negative bd_rate_pct = the
flagship needs less rate than the anchor at equal quality).

The codec build config is cloned from an existing registry entry
(``--like``), so the tool only works for continuations of a bundled
model — which is exactly the endgame it exists for. It finishes by
printing the REGISTRY snippet to paste into utils/pretrained.py.

Reference analog: the torch zoo's checkpoint export + eval_result
pickles (reference tools/collect_results.py flow); here the whole
finalize is one deterministic command so a wall-clock-bounded session
can always land its training progress.
"""
import argparse
import json
import lzma
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_run_params(run_dir):
    """(params_tree, source_tag, extra) from a run dir, preferring the
    NEWER of params.pkl (graceful finish) and last_ckpt.pkl (periodic):
    a relaunched-then-killed continuation leaves a stale params.pkl next
    to a fresher last_ckpt.pkl, and silently bundling the stale one would
    discard the continuation (advisor round 4)."""
    p_final = os.path.join(run_dir, "params.pkl")
    p_last = os.path.join(run_dir, "last_ckpt.pkl")
    have_final = os.path.exists(p_final)
    have_last = os.path.exists(p_last)
    if have_final and have_last and (os.path.getmtime(p_last)
                                     > os.path.getmtime(p_final)):
        print(f"NOTE: last_ckpt.pkl is newer than params.pkl "
              f"({os.path.getmtime(p_last) - os.path.getmtime(p_final):.0f}s)"
              f" — bundling the checkpoint (relaunched-run endgame)",
              flush=True)
        have_final = False
    if have_final:
        with open(p_final, "rb") as f:
            payload = pickle.load(f)
        tree = payload["params"] if (isinstance(payload, dict)
                                     and "params" in payload) else payload
        extra = {k: v for k, v in payload.items() if k == "complexity_levels"} \
            if isinstance(payload, dict) else {}
        return tree, "params.pkl", extra
    if have_last:
        with open(p_last, "rb") as f:
            ckpt = pickle.load(f)
        return ckpt["params"], f"last_ckpt.pkl (epoch {ckpt.get('epoch')})", {
            "resumed_epoch": ckpt.get("epoch")}
    raise SystemExit(f"no params.pkl or last_ckpt.pkl under {run_dir}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--name", required=True,
                   help="new checkpoint name (checkpoints/<name>.fp16.pkl.xz)")
    p.add_argument("--like", required=True,
                   help="registry name whose build config this run used "
                        "(the continuation seed)")
    p.add_argument("--eval-size", type=int, default=448)
    p.add_argument("--note", default="")
    p.add_argument("--steps-this-run", type=int, default=0,
                   help="optimizer steps completed in this run (for the "
                        "cumulative_steps metadata; epochs*steps_per_epoch "
                        "from the training log)")
    args = p.parse_args()

    import numpy as np

    from cbench_basic_tpu.utils import pretrained
    from tools.bundle_checkpoint import cast_fp16

    like = pretrained.REGISTRY[args.like]
    tree, source, extra = load_run_params(args.run_dir)
    out_file = os.path.join(pretrained.CHECKPOINT_DIR,
                            f"{args.name}.fp16.pkl.xz")
    payload = dict(extra)
    payload["params"] = cast_fp16(tree)
    payload.pop("resumed_epoch", None)
    with lzma.open(out_file, "wb", preset=6) as f:
        pickle.dump(payload, f)
    print(f"bundled {source} -> {out_file} "
          f"({os.path.getsize(out_file) / 1e6:.1f} MB)", flush=True)

    # Register a temporary entry so the standard loader path (fp16 ->
    # fp32 restore + codec rebuild) is exactly what gets measured.
    entry = {"file": f"{args.name}.fp16.pkl.xz", "build": dict(like["build"])}
    pretrained.REGISTRY[args.name] = entry

    import jax

    from cbench_basic_tpu.bench.metrics import bj_delta
    from cbench_basic_tpu.data import BundledPhotoDataset
    from tools.collect_rd_curve import anchor_curve, msssim_db
    from tools.train_flagship import evaluate

    print("devices:", jax.devices(), flush=True)
    full = BundledPhotoDataset(align=64)
    last = full.get_data_at(len(full) - 1)
    held = last[:args.eval_size, :args.eval_size] if args.eval_size else last

    codec = pretrained.load_flagship_codec(args.name)
    lams = like["build"].get("rate_lambdas")
    levels = []
    for lvl in range(len(lams) if lams else 1):
        if lams:
            codec.set_rate_level(lvl)
        ev = evaluate(codec, held)
        ev["rate_level"] = lvl
        if lams:
            ev["lmbda"] = lams[lvl]
        print(f"level {lvl}: {ev['bpp']:.4f} bpp  {ev['psnr']:.2f} dB  "
              f"ms-ssim {ev['ms_ssim']}", flush=True)
        levels.append(ev)

    rates = [ev["bpp"] for ev in levels]
    psnrs = [ev["psnr"] for ev in levels]
    mss = [ev["ms_ssim"] for ev in levels]
    have_ms = all(m is not None for m in mss)

    anchors, bd = {}, {}
    if len(levels) < 2:
        # bj_delta over a one-point curve integrates a zero-width
        # interval -> NaN (and json.dump would emit invalid literal NaN
        # tokens); record null BD for single-rate checkpoints instead
        # (advisor round 4, medium).
        print("single rate level: BD metrics need >=2 RD points; "
              "recording null", flush=True)
        bd = {"jpeg": None, "webp": None}
    for fmt in ("JPEG", "WEBP") if len(levels) >= 2 else ():
        ar, aq, ams = anchor_curve(held, fmt, with_ms_ssim=True)
        lo, hi = min(psnrs) - 1.0, max(psnrs) + 1.0
        keep = [i for i, q in enumerate(aq) if lo <= q <= hi]
        if len(keep) < 4:
            keep = list(range(len(aq)))
        ar_k = [ar[i] for i in keep]
        aq_k = [aq[i] for i in keep]
        # anchor first = reference curve: negative means the flagship
        # spends LESS rate than the anchor at equal PSNR.
        bd_rate = bj_delta(ar_k, aq_k, rates, psnrs, mode=1)
        bd_psnr = bj_delta(ar_k, aq_k, rates, psnrs, mode=0)
        anchors[fmt.lower()] = {"bpp": ar_k, "psnr": aq_k}
        bd[fmt.lower()] = {"bd_rate_pct": round(bd_rate, 2),
                           "bd_psnr_db": round(bd_psnr, 3)}
        print(f"vs {fmt}: BD-rate {bd_rate:+.2f}% (negative = flagship "
              f"better), BD-PSNR {bd_psnr:+.3f} dB", flush=True)
        if have_ms:
            tq = msssim_db(mss)
            aq_ms = msssim_db(ams)
            lo_m, hi_m = float(tq.min()) - 0.5, float(tq.max()) + 0.5
            keep_m = [i for i, q in enumerate(aq_ms) if lo_m <= q <= hi_m]
            if len(keep_m) < 4:
                keep_m = list(range(len(aq_ms)))
            bd_ms = bj_delta([ar[i] for i in keep_m],
                             [float(aq_ms[i]) for i in keep_m],
                             rates, [float(t) for t in tq], mode=1)
            bd[fmt.lower()]["bd_rate_msssim_pct"] = round(bd_ms, 2)
            print(f"vs {fmt} [MS-SSIM]: BD-rate {bd_ms:+.2f}%", flush=True)

    cum_prev = 0
    like_result = os.path.join(pretrained.CHECKPOINT_DIR,
                               f"{args.like}.result.json")
    if os.path.exists(like_result):
        with open(like_result) as f:
            seed_rec = json.load(f)
        # Older zoo results predate the cumulative_steps key; fall back to
        # the seed's own step count so a continuation of one does not
        # undercount lineage by millions of steps (advisor round 4).
        cum_prev = seed_rec.get("cumulative_steps",
                                seed_rec.get("steps", 0)) or 0
        if "cumulative_steps" not in seed_rec:
            print(f"NOTE: {args.like}.result.json lacks cumulative_steps; "
                  f"seeding lineage from its steps={cum_prev}", flush=True)

    result = {
        "steps": args.steps_this_run,
        "seed_checkpoint": args.like,
        "cumulative_steps": cum_prev + args.steps_this_run,
        "params_source": source,
        "N": like["build"]["N"], "M": like["build"]["M"],
        "holdout_mode": "region",
        "rate_lambdas": list(lams) if lams else None,
        "note": args.note,
        "heldout_fp16_restored_levels": [
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in ev.items() if k not in ("enc_s", "dec_s",
                                                 "identical_shape")}
            for ev in levels],
        "anchors": anchors,
        "bd_vs_anchors_fp16_restored": bd,
    }
    res_file = os.path.join(pretrained.CHECKPOINT_DIR,
                            f"{args.name}.result.json")
    with open(res_file, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {res_file}", flush=True)

    top = levels[-1]
    # ms_ssim is None for eval regions below the 5-scale MS-SSIM minimum
    # (~160px); format it only when present (advisor round 4).
    ms_str = (f'{top["ms_ssim"]:.4f}' if top.get("ms_ssim") is not None
              else "None")
    bd_jpeg = bd["jpeg"]["bd_rate_pct"] if bd.get("jpeg") else None
    bd_webp = bd["webp"]["bd_rate_pct"] if bd.get("webp") else None
    print("\nREGISTRY snippet for utils/pretrained.py:\n")
    print(f'    "{args.name}": {{\n'
          f'        "file": "{args.name}.fp16.pkl.xz",\n'
          f'        "build": dict(N={like["build"]["N"]}, '
          f'M={like["build"]["M"]}, pattern="{like["build"]["pattern"]}", '
          f'channel_groups={like["build"]["channel_groups"]},\n'
          f'                      context_channels='
          f'{like["build"]["context_channels"]}, '
          f'lmbda={like["build"]["lmbda"]}, patch={like["build"]["patch"]},\n'
          f'                      rate_lambdas='
          f'{tuple(lams) if lams else None}),\n'
          f'        "heldout_fp16_restored": dict(bpp={top["bpp"]:.4f}, '
          f'psnr={top["psnr"]:.2f},\n'
          f'                                      ms_ssim={ms_str}),\n'
          f'        "bd_rate_vs_jpeg_pct": {bd_jpeg},\n'
          f'        "bd_rate_vs_webp_pct": {bd_webp},\n'
          f'    }},')
    print(json.dumps({"name": args.name,
                      "bd_rate_vs_jpeg": bd_jpeg,
                      "bd_rate_vs_webp": bd_webp}))


if __name__ == "__main__":
    main()
