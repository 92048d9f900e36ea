#!/usr/bin/env python
"""Measure the reference implementation's coding throughput ON THIS HOST.

Round-2 VERDICT item #3: bench.py compared against an ASSUMED 1.0 MP/s
reference-class number. This script produces measured anchors by running the
actual reference code that works in this environment (its compiled C++
coders + the torch dist_entropy module path; the full NN stack needs
compressai, which is absent):

  ref_coder_plain      cbench.ans Rans64 encode+decode, Msym/s
  ref_coder_ar         cbench.ans Rans64 with 4D AR lookup, Msym/s
  ref_module_plain     GaussianDistributionEntropyCoder encode+decode
                       (torch prior->index selection + C++ coding), MP/s
  ref_module_fsar      same with finite-state AR (per-channel MLPs), MP/s
  repo_* counterparts  the repo's native coder / compat layer on the SAME
                       workload

Workload: Kodak-geometry latents — per image a (1, 32, 48, 192) stride-16
y-latent (294,912 symbols for 393,216 pixels). MP/s numbers are per IMAGE
pixel, matching bench.py's metric.

Usage: python tools/measure_reference_baseline.py [--rounds 3]
Writes JSON to stdout; paste the table into BASELINE.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests", "golden"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

H, W, STRIDE, M = 512, 768, 16, 192
LH, LW = H // STRIDE, W // STRIDE
PIXELS = H * W
SYMBOLS = LH * LW * M


def median_time(fn, rounds):
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def bench_ref_coders(refans, rounds):
    rng = np.random.default_rng(0)
    num_dists, num_symbols = 64, 256
    freqs = rng.integers(1, 1024, (num_dists, num_symbols))
    nfreqs = np.full(num_dists, num_symbols, np.int64)
    offsets = np.zeros(num_dists, np.int64)
    data = rng.integers(0, num_symbols, (1, M, LH, LW))
    indexes = rng.integers(0, num_dists, data.shape)

    enc = refans.Rans64Encoder(bypass_coding=False)
    dec = refans.Rans64Decoder(bypass_coding=False)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)
    stream = enc.encode_with_indexes(data, indexes)

    t_enc = median_time(lambda: enc.encode_with_indexes(data, indexes), rounds)
    t_dec = median_time(
        lambda: dec.decode_with_indexes(stream, indexes), rounds)
    out = {"ref_coder_plain_enc_msyms": SYMBOLS / t_enc / 1e6,
           "ref_coder_plain_dec_msyms": SYMBOLS / t_dec / 1e6}

    # AR lookup coding (what FSAR costs inside the C++ loop)
    from cbench.utils.ar_utils import create_ar_offsets
    ar_table = rng.integers(0, num_dists,
                            [1, num_dists] + [num_symbols + 1] * 2)
    enc.init_ar_params(ar_table, [[[0, -1, 0], [0, 0, -1]]])
    dec.init_ar_params(ar_table, [[[0, -1, 0], [0, 0, -1]]])
    ar_offsets = create_ar_offsets(indexes.shape, [[0, -1, 0], [0, 0, -1]])
    ar_indexes = np.zeros_like(indexes)
    stream = enc.encode_with_indexes(
        data, indexes, ar_indexes=ar_indexes, ar_offsets=ar_offsets)
    t_enc = median_time(
        lambda: enc.encode_with_indexes(
            data, indexes, ar_indexes=ar_indexes, ar_offsets=ar_offsets),
        rounds)
    t_dec = median_time(
        lambda: dec.decode_with_indexes(
            stream, indexes, ar_indexes=ar_indexes, ar_offsets=ar_offsets),
        rounds)
    out["ref_coder_ar_enc_msyms"] = SYMBOLS / t_enc / 1e6
    out["ref_coder_ar_dec_msyms"] = SYMBOLS / t_dec / 1e6
    return out


def bench_repo_coders(rounds):
    from cbench_basic_tpu.coding.ar_utils import create_ar_offsets
    from cbench_basic_tpu.coding.rans import Rans64Decoder, Rans64Encoder

    rng = np.random.default_rng(0)
    num_dists, num_symbols = 64, 256
    freqs = rng.integers(1, 1024, (num_dists, num_symbols))
    nfreqs = np.full(num_dists, num_symbols, np.int64)
    offsets = np.zeros(num_dists, np.int64)
    data = rng.integers(0, num_symbols, (1, M, LH, LW)).astype(np.int32)
    indexes = rng.integers(0, num_dists, data.shape).astype(np.int32)

    enc = Rans64Encoder(bypass_coding=False)
    dec = Rans64Decoder(bypass_coding=False)
    enc.init_params(freqs, nfreqs, offsets)
    dec.init_params(freqs, nfreqs, offsets)
    flat_d, flat_i = data.reshape(-1), indexes.reshape(-1)
    stream = enc.encode_with_indexes(flat_d, flat_i)
    t_enc = median_time(lambda: enc.encode_with_indexes(flat_d, flat_i),
                        rounds)
    t_dec = median_time(lambda: dec.decode_with_indexes(stream, flat_i),
                        rounds)
    out = {"repo_coder_plain_enc_msyms": SYMBOLS / t_enc / 1e6,
           "repo_coder_plain_dec_msyms": SYMBOLS / t_dec / 1e6}

    ar_table = np.random.default_rng(0).integers(
        0, num_dists, [1, num_dists] + [num_symbols + 1] * 2)
    enc.init_ar_params(ar_table)
    dec.init_ar_params(ar_table)
    ar_offsets = create_ar_offsets(indexes.shape, [[0, -1, 0], [0, 0, -1]])
    ar_indexes = np.zeros_like(indexes)
    stream = enc.encode_with_indexes(flat_d, flat_i, ar_indexes=ar_indexes,
                                     ar_offsets=ar_offsets)
    t_enc = median_time(
        lambda: enc.encode_with_indexes(
            flat_d, flat_i, ar_indexes=ar_indexes, ar_offsets=ar_offsets),
        rounds)
    t_dec = median_time(
        lambda: dec.decode_with_indexes(
            stream, flat_i, ar_indexes=ar_indexes, ar_offsets=ar_offsets),
        rounds)
    out["repo_coder_ar_enc_msyms"] = SYMBOLS / t_enc / 1e6
    out["repo_coder_ar_dec_msyms"] = SYMBOLS / t_dec / 1e6
    return out


def _gauss_prior_and_data(seed=0):
    rng = np.random.default_rng(seed)
    mean = rng.random((1, M, LH, LW, 1), np.float32)
    logvar = (-7.0 * rng.random((1, M, LH, LW, 1))).astype(np.float32)
    prior = np.concatenate([mean, logvar], -1)
    data = rng.random((1, M, LH, LW), np.float32)
    return prior, data


def bench_ref_module(dist_entropy, rounds, fsar):
    import torch
    torch.manual_seed(0)
    kwargs = dict(coder_type="rans64", data_range=(0.0, 1.0),
                  data_precision=256, logvar_min=-7.0, logvar_max=0.0,
                  logvar_step=0.5)
    if fsar:
        # FSAR lookup tables scale as num_dists * (P+1)^window — the
        # reference can only run finite-state AR at small data_precision
        # (its own configs use 16-level latents for FSAR).
        kwargs.update(channel_dim=M, use_autoregressive_prior=True,
                      ar_method="finitestate", ar_mlp_per_channel=False,
                      ar_offsets=[(0, -1, 0), (0, 0, -1)],
                      data_precision=16, logvar_step=1.0)
    coder = dist_entropy.GaussianDistributionEntropyCoder(**kwargs)
    coder.eval()
    coder.update_state()
    prior_np, data_np = _gauss_prior_and_data()
    prior = torch.as_tensor(prior_np)
    data = torch.as_tensor(data_np)
    stream = coder.encode(data, prior=prior)
    t_enc = median_time(lambda: coder.encode(data, prior=prior), rounds)
    t_dec = median_time(lambda: coder.decode(stream, prior=prior), rounds)
    tag = "ref_module_fsar" if fsar else "ref_module_plain"
    return {f"{tag}_enc_mpps": PIXELS / t_enc / 1e6,
            f"{tag}_dec_mpps": PIXELS / t_dec / 1e6,
            f"{tag}_bpp": len(stream) * 8 / PIXELS}


def bench_repo_module(rounds):
    from cbench_basic_tpu.compat import RefGaussianGridCoder

    coder = RefGaussianGridCoder(data_range=(0.0, 1.0), data_precision=256,
                                 logvar_min=-7.0, logvar_max=0.0,
                                 logvar_step=0.5)
    coder.update_state()
    prior, data = _gauss_prior_and_data()
    stream = coder.encode(data, prior)
    t_enc = median_time(lambda: coder.encode(data, prior), rounds)
    t_dec = median_time(lambda: coder.decode(stream, prior), rounds)
    return {"repo_module_plain_enc_mpps": PIXELS / t_enc / 1e6,
            "repo_module_plain_dec_mpps": PIXELS / t_dec / 1e6,
            "repo_module_plain_bpp": len(stream) * 8 / PIXELS}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--skip-reference", action="store_true",
                    help="only measure the repo side (no /root/reference)")
    args = ap.parse_args()

    out = {"workload": {"image": [H, W], "latent": [LH, LW, M],
                        "symbols_per_image": SYMBOLS,
                        "pixels_per_image": PIXELS},
           "host": "single CPU core (this container)"}
    out.update(bench_repo_coders(args.rounds))
    out.update(bench_repo_module(args.rounds))
    if not args.skip_reference:
        from generate_reference_module_golden import load_reference_modules
        dist_entropy, _ = load_reference_modules()
        import cbench.ans as refans
        out.update(bench_ref_coders(refans, args.rounds))
        out.update(bench_ref_module(dist_entropy, args.rounds, fsar=False))
        out.update(bench_ref_module(dist_entropy, args.rounds, fsar=True))
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}, indent=2))


if __name__ == "__main__":
    main()
