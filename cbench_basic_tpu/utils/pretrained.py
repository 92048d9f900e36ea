"""Bundled pretrained checkpoints.

The environment has zero egress, so the only trained weights that can
exist are ones trained in-repo. ``checkpoints/`` at the repo root holds
them as fp16-cast, xz-compressed pickles of the trainer's ``params.pkl``
pytree (reference analog: the published model zoo the reference's
``configs/pretrained`` entries download; here the zoo is self-trained —
see tools/train_flagship.py and docs/performance.md "Trained-model RD").

Checkpoints are small (~14 MB) because inference restores fp32 from an
fp16 cast. The cast was verified on-device: the restored weights
reproduce the fp32 eval to 0.002 dB PSNR / 0.1% bpp (MS-SSIM shifts
0.9682 -> 0.9586); REGISTRY records both measurements per checkpoint.
"""
import lzma
import os
import pickle

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CHECKPOINT_DIR = os.path.join(_REPO_ROOT, "checkpoints")

# name -> (filename, build kwargs for tools/train_flagship.build_codec)
FLAGSHIP_120K = "flagship_elic_l0.01_120k"
FLAGSHIP_VR4 = "flagship_elic_vr4_1400k"
REGISTRY = {
    FLAGSHIP_120K: {
        "file": "flagship_elic_l0.01_120k.fp16.pkl.xz",
        "build": dict(N=128, M=192, pattern="elic", channel_groups=5,
                      context_channels=256, lmbda=0.01, patch=128),
        # fp32 training-run eval / fp16-restored re-eval (both measured on
        # the tunneled v5e, 2026-08-18, same held-out 448px region):
        "heldout": dict(bpp=1.0527, psnr=29.92, ms_ssim=0.9682),
        "heldout_fp16_restored": dict(bpp=1.0514, psnr=29.92,
                                      ms_ssim=0.9586),
    },
    # ft-ssim stage-2 fine-tune of the vr4 flagship (the reference's
    # two-stage flow, presets/lossy_latent_graph_scalable_ar_models.py:
    # 708-727): 400k steps at patch 192 (TRUE 5-scale MS-SSIM objective),
    # same lambda list as stage 1. On the held-out region it beats BOTH
    # anchors in the MS-SSIM domain — BD-rate +29.7% vs JPEG, +13.3% vs
    # WebP (positive = anchor needs more rate at equal MS-SSIM) — while
    # losing PSNR, as an MS-SSIM-optimized model should. Listed BEFORE
    # the vr4 entry so best_checkpoint() keeps preferring the PSNR
    # flagship (registry order = preference, oldest first).
    "flagship_elic_vr4_ssim_400k": {
        "file": "flagship_elic_vr4_ssim_400k.fp16.pkl.xz",
        "build": dict(N=128, M=192, pattern="elic", channel_groups=5,
                      context_channels=256, lmbda=0.01, patch=192,
                      rate_lambdas=(0.0018, 0.0035, 0.0067, 0.013),
                      distortion="ms_ssim"),
        "heldout": dict(bpp=2.1526, psnr=33.79, ms_ssim=0.9956),
        "heldout_fp16_restored": dict(bpp=2.1563, psnr=33.77,
                                      ms_ssim=0.9956),
        "bd_rate_msssim_vs_jpeg_pct": 29.7,
        "bd_rate_msssim_vs_webp_pct": 13.3,
    },
    # Variable-rate flagship: ONE model spanning four rate levels via
    # gain vectors (rate_level_lambdas training), 1.4M steps on the
    # bundled photos + synthetic natural-statistics images, held-out
    # 448px region disjoint from training. Beats the JPEG anchor curve
    # (see checkpoints/flagship_elic_vr4_1400k.result.json for the
    # four-level RD + BD-rate numbers, measured on the v5e 2026-08-19).
    FLAGSHIP_VR4: {
        "file": "flagship_elic_vr4_1400k.fp16.pkl.xz",
        "build": dict(N=128, M=192, pattern="elic", channel_groups=5,
                      context_channels=256, lmbda=0.01, patch=128,
                      rate_lambdas=(0.0018, 0.0035, 0.0067, 0.013)),
        "heldout": dict(bpp=0.7426, psnr=31.04, ms_ssim=0.9628),
        # re-measured after bundling (fp16-restored, rans32 lane format —
        # ~9% smaller streams than the training-run eval at the same PSNR):
        "heldout_fp16_restored": dict(bpp=0.6722, psnr=31.02,
                                      ms_ssim=0.9628),
        "bd_rate_vs_jpeg_pct": -15.35,
    },
    # 320k-step continuation of the 4400k flagship that REGRESSED
    # (BD-rate -22.39% vs the seed's -22.88%; worse rate at levels 0/2/3
    # for <0.05 dB — see flagship_elic_vr4_4720k.result.json). Bundled
    # for the record because it documents that the more-steps lever is
    # exhausted at this data scale (docs/performance.md round-5 note);
    # registered BEFORE the 4400k entry so best_checkpoint() keeps
    # preferring the seed (registry order = preference).
    "flagship_elic_vr4_4720k": {
        "file": "flagship_elic_vr4_4720k.fp16.pkl.xz",
        "build": dict(N=128, M=192, pattern="elic", channel_groups=5,
                      context_channels=256, lmbda=0.01, patch=128,
                      rate_lambdas=(0.0018, 0.0035, 0.0067, 0.013)),
        "heldout_fp16_restored": dict(bpp=0.6297, psnr=31.19,
                                      ms_ssim=0.9606),
        "bd_rate_vs_jpeg_pct": -22.39,
        "bd_rate_vs_webp_pct": 38.95,
    },
    # 3M-step continuation of the vr4 flagship (seeded from the 1400k
    # weights; 192 training images — bundled photos + 189 synthetic at
    # 512px with the 5-way textured/dead-leaves/collage mix + color
    # permutation; lr 7e-5 with a 10x drop at 65%). Better at EVERY
    # rate level than its seed on the same held-out region (eval below).
    # Last entry = preferred by best_checkpoint().
    "flagship_elic_vr4_4400k": {
        "file": "flagship_elic_vr4_4400k.fp16.pkl.xz",
        "build": dict(N=128, M=192, pattern="elic", channel_groups=5,
                      context_channels=256, lmbda=0.01, patch=128,
                      rate_lambdas=(0.0018, 0.0035, 0.0067, 0.013)),
        # fp32 training-run final eval (rate level 3):
        "heldout": dict(bpp=0.6246, psnr=31.15, ms_ssim=0.9610),
        # fp16-restored re-measurement (v5e 2026-08-20, rans32 format):
        "heldout_fp16_restored": dict(bpp=0.6254, psnr=31.14,
                                      ms_ssim=0.9610),
        "bd_rate_vs_jpeg_pct": -22.88,
        "bd_rate_vs_webp_pct": 38.14,
    },
}


def checkpoint_path(name: str) -> str:
    return os.path.join(CHECKPOINT_DIR, REGISTRY[name]["file"])


def has_checkpoint(name: str) -> bool:
    return name in REGISTRY and os.path.exists(checkpoint_path(name))


def best_checkpoint():
    """Name of the preferred AVAILABLE checkpoint: registry order is
    oldest-first, so the newest (best-trained) present file wins."""
    for name in reversed(list(REGISTRY)):
        if has_checkpoint(name):
            return name
    return None


def rate_lambdas(name: str):
    """Per-rate-level lambdas for variable-rate checkpoints, else None."""
    return REGISTRY[name]["build"].get("rate_lambdas")


def _restore_fp32(tree):
    if isinstance(tree, dict):
        return {k: _restore_fp32(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_restore_fp32(v) for v in tree)
    a = np.asarray(tree)
    if a.dtype == np.float16:
        return a.astype(np.float32)
    return a


def load_params(name: str = FLAGSHIP_120K):
    """Load a bundled checkpoint as an fp32 params pytree.

    The stored payload is the trainer's ``params.pkl`` format
    (``{"params": tree, "complexity_levels"?: ...}``) or a raw tree.
    """
    with lzma.open(checkpoint_path(name), "rb") as f:
        payload = pickle.load(f)
    if isinstance(payload, dict) and "params" in payload:
        payload = payload["params"]
    return _restore_fp32(payload)


def load_flagship_codec(name: str = FLAGSHIP_120K, rng=None):
    """Rebuild the flagship codec and install the bundled trained params.

    Returns the ready-to-use ``LatentGraphCodec`` (call ``update_state()``
    before coding, as the trainer does).
    """
    import jax

    from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
    from cbench_basic_tpu.graph import build_topogroup_hyperprior_graph

    cfg = REGISTRY[name]["build"]
    lams = cfg.get("rate_lambdas")
    model, specs = build_topogroup_hyperprior_graph(
        N=cfg["N"], M=cfg["M"], pattern=cfg["pattern"],
        num_channel_groups=cfg["channel_groups"],
        context_channels=cfg["context_channels"], lmbda=cfg["lmbda"],
        num_rate_levels=len(lams) if lams else 1)
    codec = LatentGraphCodec(model, specs, alignment=64,
                             coding_mode="tpu", num_lanes=2048)
    codec.init_params(rng if rng is not None else jax.random.PRNGKey(0),
                      input_shape=(1, cfg["patch"], cfg["patch"], 3))
    codec.params = load_params(name)
    if hasattr(codec, "invalidate_coders"):
        codec.invalidate_coders()
    return codec
