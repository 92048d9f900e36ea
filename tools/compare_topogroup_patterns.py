#!/usr/bin/env python
"""Learned topogroup predictor vs the fixed ELIC pattern, head to head.

The BaSIC paper's central claim is that a LEARNED intra-node BayesNet
(per-position group assignment predicted from the hyperprior,
reference pgm_coder.py:1498-1604) finds better group structures than
hand-designed patterns. This tool measures both sides on the held-out
region through the REAL bitstream path:

  * the fixed-pattern flagship from the registry (--fixed, default the
    preferred checkpoint, ELIC-10 pattern), and
  * a learned-pattern run directory from tools/train_flagship.py
    --pattern learned (--learned-dir, loads params.pkl/last_ckpt.pkl),

reporting per rate level: bpp, PSNR, MS-SSIM, decode seconds, and the
number of REALIZED decode groups (non-empty groups the decoder actually
steps through — the learned predictor may starve groups).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def realized_groups(codec, img):
    """Number of non-empty topogroups the decode actually steps through."""
    import numpy as np

    coder = codec.model.node_coders[codec.model.generative_order[1]]
    if coder.pattern != "learned":
        n, h, w = 1, *codec._prep_image(img)[0].shape[1:3]
        yc, ys = codec.node_specs[codec.model.generative_order[1]]
        num = coder.num_groups_for((1, h // ys, w // ys, yc))
        return num
    # learned: run the gmap pass on the real stream
    x, _ = codec._prep_image_u8(img)
    import jax.numpy as jnp
    out = codec._tpu_encode_fn(codec.params, jnp.asarray(x),
                               codec.current_vrlevel(),
                               edge_levels=codec._edge_levels,
                               return_gmap=True)
    gmap_cg = np.asarray(out[-1])
    _, ids, _ = codec._y_segments_learned(gmap_cg, codec.num_lanes)
    return len(ids)


def evaluate_side(tag, codec, held, lams):
    from tools.train_flagship import evaluate

    rows = []
    for lv in range(len(lams) if lams else 1):
        if lams:
            codec.set_rate_level(lv)
        ev = evaluate(codec, held)
        ev["rate_level"] = lv
        ev["groups"] = realized_groups(codec, held)
        rows.append(ev)
        print(f"{tag} level {lv}: {ev['bpp']:.4f} bpp  {ev['psnr']:.2f} dB"
              f"  ms-ssim {ev['ms_ssim']}  dec {ev['dec_s']:.3f}s  "
              f"groups {ev['groups']}", flush=True)
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--learned-dir", required=True,
                   help="train_flagship.py --pattern learned run dir")
    p.add_argument("--fixed", default=None,
                   help="registry checkpoint for the fixed-pattern side "
                        "(default: preferred)")
    p.add_argument("--num-topo-groups", type=int, default=2)
    p.add_argument("--learned-estimator", default="vimco")
    p.add_argument("--eval-size", type=int, default=448)
    p.add_argument("--out", default=None, help="result JSON path")
    args = p.parse_args()

    import types

    import jax
    import numpy as np

    from cbench_basic_tpu.data import BundledPhotoDataset
    from cbench_basic_tpu.utils import pretrained
    from tools.finalize_flagship import load_run_params
    from tools.train_flagship import build_codec

    full = BundledPhotoDataset(align=64)
    last = full.get_data_at(len(full) - 1)
    held = last[:args.eval_size, :args.eval_size]

    fixed_name = args.fixed or pretrained.best_checkpoint()
    fixed = pretrained.load_flagship_codec(fixed_name)
    fixed.update_state()
    lams = pretrained.rate_lambdas(fixed_name)
    print(f"fixed side: {fixed_name} (pattern elic)", flush=True)
    fixed_rows = evaluate_side("fixed", fixed, held, lams)

    build = pretrained.REGISTRY[fixed_name]["build"]
    largs = types.SimpleNamespace(
        N=build["N"], M=build["M"], pattern="learned",
        channel_groups=build["channel_groups"],
        context_channels=build["context_channels"], lmbda=build["lmbda"],
        rate_lambdas=",".join(str(v) for v in build["rate_lambdas"])
        if build.get("rate_lambdas") else None,
        patch=build["patch"], distortion="mse",
        learned_estimator=args.learned_estimator,
        num_topo_groups=args.num_topo_groups, init_from=None,
        output_dir=args.learned_dir)
    learned = build_codec(largs, jax.random.PRNGKey(0))
    tree, source, _ = load_run_params(args.learned_dir)
    learned.params = jax.tree_util.tree_map(np.asarray, tree)
    learned.invalidate_coders()
    learned.update_state()
    print(f"learned side: {args.learned_dir} ({source})", flush=True)
    learned_rows = evaluate_side("learned", learned, held, lams)

    result = {"fixed_checkpoint": fixed_name,
              "learned_dir": args.learned_dir,
              "num_topo_groups": args.num_topo_groups,
              "fixed": [{k: (round(v, 4) if isinstance(v, float) else v)
                         for k, v in r.items()} for r in fixed_rows],
              "learned": [{k: (round(v, 4) if isinstance(v, float) else v)
                           for k, v in r.items()} for r in learned_rows]}
    out = args.out or os.path.join(args.learned_dir,
                                   "pattern_comparison.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}", flush=True)
    print(json.dumps({"fixed_bpp": fixed_rows[-1]["bpp"],
                      "fixed_psnr": fixed_rows[-1]["psnr"],
                      "learned_bpp": learned_rows[-1]["bpp"],
                      "learned_psnr": learned_rows[-1]["psnr"]}))


if __name__ == "__main__":
    main()
