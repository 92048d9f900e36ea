#!/usr/bin/env python
"""Convert reference/CompressAI PyTorch hyperprior checkpoints to this
framework's flax parameter pytrees.

Parity: reference tools/compressai_checkpoint_to_cbench.py (key remapping
precedent). Supported source layouts: CompressAI `bmshj2018_hyperprior` /
`mbt2018_mean` state dicts (g_a/g_s/h_a/h_s conv stacks + entropy_bottleneck
quantiles/matrices/biases/factors + gaussian_conditional tables).

Weight layout mapping (validated by tests/test_torch_convert.py):
  * Conv2d weight (O, I, kH, kW)        -> flax kernel (kH, kW, I, O)
  * ConvTranspose2d weight (I, O, kH, kW) -> flax ConvTranspose kernel
    (kH, kW, I, O); note flax SAME deconv may differ from torch
    output_padding alignment by one pixel on odd geometries.
  * GDN beta/gamma (already sqrt-reparameterized by CompressAI's
    NonNegativeParametrizer) -> NonNegativeParam 'reparam' values;
    gamma transposed (out,in) -> (in,out).
  * EntropyBottleneck _matrixK/_biasK/_factorK (C, d_out, d_in) -> matrix_k
    etc. (same layout); quantiles (C,1,3) -> quantiles.
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def t_deconv(w):
    return np.transpose(np.asarray(w), (2, 3, 0, 1))


def convert_gdn(state, prefix):
    beta = np.asarray(state[f"{prefix}.beta"])
    gamma = np.asarray(state[f"{prefix}.gamma"])
    c = beta.shape[0]
    return {
        "beta": {"reparam": beta},
        "gamma": {"reparam": gamma.reshape(c, c).T},
    }


def convert_conv(state, prefix, transpose=False):
    w = state[f"{prefix}.weight"]
    return {
        "kernel": t_deconv(w) if transpose else t_conv(w),
        "bias": np.asarray(state[f"{prefix}.bias"]),
    }


def convert_entropy_bottleneck(state, prefix="entropy_bottleneck", filters=4):
    out = {"quantiles": np.asarray(state[f"{prefix}.quantiles"])}
    for k in range(filters + 1):
        out[f"matrix_{k}"] = np.asarray(state[f"{prefix}._matrix{k}"])
        out[f"bias_{k}"] = np.asarray(state[f"{prefix}._bias{k}"])
        if k < filters:
            out[f"factor_{k}"] = np.asarray(state[f"{prefix}._factor{k}"])
    return out


def convert_hyperprior(state_dict, mean_scale: bool):
    """CompressAI ScaleHyperprior/MeanScaleHyperprior -> flax params for
    cbench_basic_tpu.nn.models.{Scale,MeanScale}Hyperprior."""
    s = state_dict
    # Sequential indices in CompressAI: convs at even slots, GDN at odd.
    def stack(prefix, conv_slots, gdn_slots, transpose=False):
        name = "ConvTranspose" if transpose else "Conv"
        params = {}
        for i, slot in enumerate(conv_slots):
            params[f"{name}_{i}"] = convert_conv(s, f"{prefix}.{slot}", transpose)
        for i, slot in enumerate(gdn_slots):
            params[f"GDN_{i}"] = convert_gdn(s, f"{prefix}.{slot}")
        return params

    out = {
        "g_a": stack("g_a", (0, 2, 4, 6), (1, 3, 5)),
        "g_s": stack("g_s", (0, 2, 4, 6), (1, 3, 5), transpose=True),
        "h_a": {
            "Conv_0": convert_conv(s, "h_a.0"),
            "Conv_1": convert_conv(s, "h_a.2"),
            "Conv_2": convert_conv(s, "h_a.4"),
        },
        "h_s": {
            "ConvTranspose_0": convert_conv(s, "h_s.0", transpose=True),
            "ConvTranspose_1": convert_conv(s, "h_s.2", transpose=True),
            "Conv_0": convert_conv(s, "h_s.4"),
        },
        "entropy_bottleneck": convert_entropy_bottleneck(s),
    }
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint", help="torch .pth/.pt state dict")
    p.add_argument("output", help="output params.pkl")
    p.add_argument("--mean-scale", action="store_true")
    args = p.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu")
    state = ckpt.get("state_dict", ckpt)
    state = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in state.items()}
    params = convert_hyperprior(state, args.mean_scale)
    with open(args.output, "wb") as f:
        pickle.dump(params, f)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
