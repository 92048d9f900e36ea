#!/usr/bin/env python
"""Long-schedule flagship training on real photos, TPU-native.

The reference's published models come from a 2000-epoch torch DataLoader
schedule (reference configs/lossy_graph_scalable_exp.py trainer wiring +
nn/trainer.py fit loop). This tool is the TPU-native equivalent of that
schedule runner: the training set lives in HBM once, and the whole inner
loop (sample patches -> loss -> grad -> update) runs K steps per XLA
dispatch via NeuralCodecTrainer(scan_steps=K) + DevicePatchSampler — so a
network-attached TPU is compute-bound instead of tunnel-latency-bound.

Checkpoints/resume use the trainer's own two-tier mechanism (last_ckpt +
params.pkl), so the run can be killed and re-launched with the same
--output-dir at any time.

After training it scores the REAL pipeline on a held-out photo: full
compress -> bitstream -> decompress through the native rANS coder, with
JPEG/WebP anchor points at matched rate printed alongside.
"""
import argparse
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output-dir", default="/tmp/flagship_run")
    p.add_argument("--steps", type=int, default=20000,
                   help="total optimizer steps")
    p.add_argument("--steps-per-epoch", type=int, default=1000)
    p.add_argument("--scan", type=int, default=100,
                   help="steps per XLA dispatch (lax.scan length)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--patch", type=int, default=128)
    p.add_argument("--lmbda", type=float, default=0.01)
    p.add_argument("--rate-lambdas", default=None,
                   help="comma list of per-level lambdas: trains ONE "
                        "variable-rate model with gain vectors (one rate "
                        "level per lambda) instead of a fixed-rate one")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="checkpoint every N epochs (long schedules: raise "
                        "it — each write serializes the full fp32 state)")
    p.add_argument("--lr-drop-at", type=float, default=0.0,
                   help="if in (0,1), drop lr 10x after this fraction of "
                        "total steps (the reference's fine-tune-stage decay)")
    p.add_argument("--N", type=int, default=128)
    p.add_argument("--M", type=int, default=192)
    p.add_argument("--pattern", default="elic")
    p.add_argument("--learned-estimator", default=None,
                   choices=("relaxation", "reinforce", "vimco", "thermo"),
                   help="training estimator for --pattern learned (the "
                        "reference's MC-sampled topogroup predictor, "
                        "pgm_coder.py:1498-1604)")
    p.add_argument("--num-topo-groups", type=int, default=2,
                   help="spatial groups per channel group for --pattern "
                        "learned (2 matches the ELIC checkerboard budget: "
                        "2 x channel-groups total decode passes)")
    p.add_argument("--channel-groups", type=int, default=5)
    p.add_argument("--context-channels", type=int, default=256)
    p.add_argument("--eval-size", type=int, default=448,
                   help="held-out eval crop (0 = full image)")
    p.add_argument("--holdout-mode", choices=("image", "region"),
                   default="image",
                   help="image: hold out the last photo entirely (domain "
                        "shift: the portrait vs the outdoor training pair). "
                        "region: train on ALL photos minus the eval crop's "
                        "pixels (disjoint-region protocol — matched "
                        "statistics, zero pixel overlap)")
    p.add_argument("--no-final-eval", action="store_true")
    p.add_argument("--synthetic", type=int, default=0,
                   help="add N synthetic dead-leaves/noise/gradient images "
                        "(natural-image statistics, palettes from the real "
                        "photos) to the training set — the zero-egress "
                        "stand-in for the reference's ImageNet subset")
    p.add_argument("--synthetic-size", type=int, default=512)
    p.add_argument("--synthetic-mix", default=None,
                   help="comma weights for the synthetic generator classes: "
                        "3 values = legacy (dead-leaves, 1/f-noise, "
                        "gradients); 5 values adds (textured-leaves, "
                        "photo-collage): dl,tl,noise,grad,collage. Default "
                        "keeps the legacy mix the bundled checkpoints "
                        "trained on")
    p.add_argument("--color-permute", action="store_true",
                   help="random RGB channel permutation per training patch")
    p.add_argument("--eval-every", type=int, default=0,
                   help="if >0, run the held-out bitstream eval every this "
                        "many steps and append to eval_history in the "
                        "result JSON (monitors generalization during long "
                        "schedules)")
    p.add_argument("--distortion", default="mse",
                   choices=("mse", "ms_ssim"),
                   help="training objective; ms_ssim = the reference's "
                        "ft-ssim stage-2 fine-tune (presets/"
                        "lossy_latent_graph_scalable_ar_models.py:708-727)")
    p.add_argument("--init-from", default=None,
                   help="bundled checkpoint registry name to seed params "
                        "from when starting fresh (the stage-1 -> stage-2 "
                        "weight flow); ignored when the output dir resumes")
    return p.parse_args()


def rate_lambdas(args):
    return ([float(v) for v in args.rate_lambdas.split(",")]
            if args.rate_lambdas else None)


def build_codec(args, rng):
    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph

    lams = rate_lambdas(args)
    coder_kwargs = {}
    if args.pattern == "learned":
        if getattr(args, "learned_estimator", None):
            coder_kwargs["learned_estimator"] = args.learned_estimator
        coder_kwargs["num_topo_groups"] = getattr(
            args, "num_topo_groups", 2)
    model, specs = build_topogroup_hyperprior_graph(
        N=args.N, M=args.M, pattern=args.pattern,
        num_channel_groups=args.channel_groups,
        context_channels=args.context_channels, lmbda=args.lmbda,
        num_rate_levels=len(lams) if lams else 1,
        distortion=getattr(args, "distortion", "mse"), **coder_kwargs)
    codec = LatentGraphCodec(model, specs, alignment=64,
                             coding_mode="tpu", num_lanes=2048)
    codec.init_params(rng, input_shape=(1, args.patch, args.patch, 3))
    if getattr(args, "init_from", None):
        import os as _os
        from cbench_basic_tpu.utils import pretrained
        resumable = _os.path.exists(
            _os.path.join(args.output_dir, "last_ckpt.pkl"))
        if not resumable:
            loaded = pretrained.load_params(args.init_from)
            codec.params, stats = _overlay_params(codec.params, loaded)
            codec.invalidate_coders()
            print(f"seeded params from bundled checkpoint "
                  f"{args.init_from!r}: {stats['used']} leaves loaded, "
                  f"{stats['fresh']} fresh (new submodules, e.g. a learned "
                  f"topogroup predictor), {stats['skipped']} shape-skipped",
                  flush=True)
    return codec


def _overlay_params(fresh, loaded):
    """Overlay checkpoint leaves onto a freshly-initialized tree wherever
    path AND shape match; keep fresh init elsewhere. This is what lets a
    checkpoint trained with a fixed topogroup pattern seed a model that
    adds new submodules (the learned-pattern predictor) — the reference's
    load_state_dict(strict=False) flow."""
    import jax
    stats = {"used": 0, "fresh": 0, "skipped": 0}

    def rec(f, l):
        if isinstance(f, dict):
            out = {}
            for k, v in f.items():
                if isinstance(l, dict) and k in l:
                    out[k] = rec(v, l[k])
                else:
                    out[k] = v
                    stats["fresh"] += sum(
                        1 for _ in jax.tree_util.tree_leaves(v))
            return out
        if getattr(f, "shape", None) == getattr(l, "shape", None):
            stats["used"] += 1
            return l
        stats["skipped"] += 1
        return f

    return rec(fresh, loaded), stats


def classical_anchor(img, fmt, target_bpp):
    """(bpp, psnr) of the PIL codec at the quality closest to target_bpp."""
    import numpy as np
    from PIL import Image
    best = None
    npix = img.shape[0] * img.shape[1]
    for q in (10, 20, 30, 40, 50, 60, 70, 80, 90, 95):
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format=fmt, quality=q)
        bpp = len(buf.getvalue()) * 8 / npix
        rec = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
        mse = np.mean((rec.astype(np.float64) - img.astype(np.float64)) ** 2)
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        if best is None or abs(bpp - target_bpp) < abs(best[0] - target_bpp):
            best = (bpp, psnr, q)
    return best


def evaluate(codec, img, warmup: bool = True):
    import numpy as np
    from cbench_basic_tpu.bench.metrics import BatchedImageDistortion
    codec.update_state()
    if warmup:  # compile pass so enc_s/dec_s report steady-state coding time
        codec.decompress(codec.compress(img))
    t0 = time.time()
    stream = codec.compress(img)
    t_enc = time.time() - t0
    t0 = time.time()
    rec = codec.decompress(stream)
    t_dec = time.time() - t0
    npix = img.shape[0] * img.shape[1]
    dist = BatchedImageDistortion(compute_ms_ssim=True)
    m = dist(rec, img)
    ms = float(m.get("ms_ssim", float("nan")))
    return {
        "bpp": len(stream) * 8 / npix,
        "psnr": float(m["psnr"]),
        # MS-SSIM needs >= 160px after 4 halvings; None keeps JSON strict.
        "ms_ssim": ms if np.isfinite(ms) else None,
        "enc_s": t_enc, "dec_s": t_dec,
        "identical_shape": bool(rec.shape == img.shape),
    }


def main():
    args = parse_args()
    import jax
    import numpy as np

    from cbench_basic_tpu.data import BundledPhotoDataset, DevicePatchSampler
    from cbench_basic_tpu.train.trainer import NeuralCodecTrainer

    print("devices:", jax.devices(), flush=True)
    full = BundledPhotoDataset(align=64)
    if len(full) < 3:
        raise SystemExit("no bundled photos available")
    last = full.get_data_at(len(full) - 1)
    held = last[:args.eval_size, :args.eval_size] if args.eval_size else last
    if args.holdout_mode == "region":
        # disjoint-region protocol: every pixel of the eval crop is excluded
        # from training, but the remaining strips of the SAME photo train —
        # matched statistics without pixel overlap.
        train_imgs = [full.get_data_at(i) for i in range(len(full) - 1)]
        right = last[:, args.eval_size:]
        bottom = last[args.eval_size:, :]
        for strip in (right, bottom):
            if min(strip.shape[:2], default=0) >= args.patch:
                train_imgs.append(np.ascontiguousarray(strip))
    else:
        train_imgs = [full.get_data_at(i) for i in range(len(full) - 1)]

    if args.synthetic:
        from cbench_basic_tpu.data.synthetic import synthetic_training_images
        mix_kwargs = {}
        if args.synthetic_mix:
            mix_kwargs["mix"] = tuple(
                float(v) for v in args.synthetic_mix.split(","))
        train_imgs = train_imgs + synthetic_training_images(
            args.synthetic, size=args.synthetic_size, seed=1,
            photos=train_imgs, **mix_kwargs)
        print(f"training set: {len(train_imgs)} images "
              f"({args.synthetic} synthetic)", flush=True)

    codec = build_codec(args, jax.random.PRNGKey(0))
    sampler = DevicePatchSampler(train_imgs, patch_size=args.patch,
                                 batch_size=args.batch,
                                 steps_per_epoch=args.steps_per_epoch,
                                 color_permute=args.color_permute)
    num_epochs = max(1, args.steps // args.steps_per_epoch)

    eval_history = []

    def _epoch_eval(epoch, step, params):
        if not args.eval_every or step % args.eval_every:
            return
        import jax as _jax
        prev = codec.params
        codec.params = _jax.device_get(params)
        codec.invalidate_coders()
        try:
            lams = rate_lambdas(args)
            if lams:
                codec.set_rate_level(len(lams) - 1)
            ev = evaluate(codec, held, warmup=False)
            ev["step"] = step
            eval_history.append(ev)
            print(f"[eval @ step {step}] held-out {ev['bpp']:.3f} bpp "
                  f"{ev['psnr']:.2f} dB", flush=True)
        finally:
            codec.params = prev
            codec.invalidate_coders()

    lr_schedule = None
    if 0.0 < args.lr_drop_at < 1.0:
        drop_step = int(args.steps * args.lr_drop_at)
        from cbench_basic_tpu.train.schedulers import step_decay
        lr_schedule = step_decay(args.lr, drop_step, gamma=0.1)

    trainer = NeuralCodecTrainer(
        dataloader=sampler, num_epochs=num_epochs, scan_steps=args.scan,
        learning_rate=args.lr, output_dir=args.output_dir,
        data_parallel=False, log_every=args.scan,
        checkpoint_every_epochs=args.ckpt_every, check_finite=True,
        rate_level_lambdas=rate_lambdas(args),
        lr_schedule=lr_schedule,
        epoch_callback=_epoch_eval if args.eval_every else None)

    t0 = time.time()
    metrics = trainer.train_module(codec)
    t_train = time.time() - t0
    steps_s = args.steps / max(t_train, 1e-9)
    loss = metrics.get("loss")
    print(f"trained {args.steps} steps in {t_train:.0f}s "
          f"({steps_s:.1f} steps/s), final loss "
          f"{'n/a (resumed, fully trained)' if loss is None else f'{loss:.4f}'}",
          flush=True)

    result = {"train_metrics": {k: v for k, v in metrics.items()
                                if isinstance(v, (int, float))},
              "eval_history": eval_history,
              "steps": args.steps, "steps_per_s": steps_s,
              "lmbda": args.lmbda, "N": args.N, "M": args.M,
              "holdout_mode": args.holdout_mode,
              "num_train_images": len(train_imgs)}
    if not args.no_final_eval:
        lams = rate_lambdas(args)
        if lams:
            # ONE variable-rate model: an RD point per trained rate level.
            result["heldout_levels"] = []
            for lvl, lam in enumerate(lams):
                codec.set_rate_level(lvl)
                ev = evaluate(codec, held)
                ev["rate_level"], ev["lmbda"] = lvl, lam
                result["heldout_levels"].append(ev)
                print(f"level {lvl} (lambda={lam}): {ev['bpp']:.3f} bpp, "
                      f"{ev['psnr']:.2f} dB PSNR", flush=True)
            ev = result["heldout_levels"][-1]
            result["heldout"] = ev
        else:
            ev = evaluate(codec, held)
            result["heldout"] = ev
        for fmt in ("JPEG", "WEBP"):
            bpp, psnr, q = classical_anchor(held, fmt, ev["bpp"])
            result[f"anchor_{fmt.lower()}"] = {
                "bpp": bpp, "psnr": psnr, "quality": q}
            print(f"{fmt} anchor @q{q}: {bpp:.3f} bpp, {psnr:.2f} dB",
                  flush=True)
        ms = ("n/a" if ev["ms_ssim"] is None else f"{ev['ms_ssim']:.4f}")
        print(f"flagship held-out: {ev['bpp']:.3f} bpp, "
              f"{ev['psnr']:.2f} dB PSNR, ms-ssim {ms}", flush=True)

    out_file = os.path.join(args.output_dir, "flagship_result.json")
    if not result["train_metrics"] and os.path.exists(out_file):
        # resumed fully-trained run (re-evaluation only): keep the original
        # training metrics instead of clobbering them with an empty dict
        with open(out_file) as f:
            prev = json.load(f)
        result["train_metrics"] = prev.get("train_metrics", {})
        result["steps_per_s"] = prev.get("steps_per_s", result["steps_per_s"])
    with open(out_file, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "train_metrics"}), flush=True)


if __name__ == "__main__":
    main()
