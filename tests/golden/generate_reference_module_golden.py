#!/usr/bin/env python
"""Generate MODULE-level golden artifacts from the reference implementation.

Round-2 VERDICT item: coder-level bit-exactness was proven (ref_golden.npz),
but no test compared a full module bitstream — quantization grid, index
selection, PMF table quantization, AR lookup-table construction, and stream
layout — between the reference and this repo on shared weights.

This script compiles the reference pybind11 coders (``cbench.ans``,
``cbench.rans``) from /root/reference/cbench/csrc, stubs pytorch_lightning
(only used as a base class), instantiates the reference's
``GaussianDistributionEntropyCoder`` (dist_entropy.py) and
``AutoregressiveEntropyCoder`` (autoregressive.py) with fixed seeds, and
records for each case: config, weights, inputs, every intermediate
(selected indexes, preprocessed symbols, exported integer tables, AR lookup
tables), and the final module bitstream.

Cases:
  m1: Gaussian mean x logvar grid, rans64, no AR   (dist_entropy.py:608-783)
  m2: m1 + finite-state AR via per-channel MLPs,
      lookup tables + default-bias coding          (dist_entropy.py:184-605)
  m3: m1 + ar_method="linear" custom linear op AR  (dist_entropy.py:732-748)
  m4: categorical AutoregressiveEntropyCoder, rans,
      trainable prior, shape header                (autoregressive.py:368-844)

Only compiled-output artifacts enter the repo — no reference source code.
"""

import os
import subprocess
import sys
import sysconfig
import tempfile
import types

import numpy as np

REF_CSRC = "/root/reference/cbench/csrc"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ref_module_golden.npz")


def _build(name, srcs, incdirs):
    import torch
    build_dir = tempfile.mkdtemp(prefix="ref_" + name)
    torch_inc = os.path.join(os.path.dirname(torch.__file__), "include")
    py_inc = sysconfig.get_paths()["include"]
    ext = sysconfig.get_config_var("EXT_SUFFIX")
    so = os.path.join(build_dir, name + ext)
    subprocess.run(
        ["g++", "-O2", "-std=c++17", "-DNDEBUG", "-shared", "-fPIC",
         f"-I{torch_inc}", f"-I{py_inc}"]
        + [f"-I{d}" for d in incdirs] + srcs + ["-o", so],
        check=True, capture_output=True)
    return build_dir, so


def load_reference_modules():
    """Compile + register cbench.ans / cbench.rans, stub lightning, and
    return the two reference entropy-coder modules."""
    import importlib.util

    import torch.nn as nn

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")

        class LightningModule(nn.Module):
            pass

        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl

    sys.path.insert(0, "/root/reference")
    import cbench  # noqa: F401  (parent package must exist first)

    ext = sysconfig.get_config_var("EXT_SUFFIX")
    for name, srcs, inc in [
        ("ans", [f"{REF_CSRC}/ans/{f}" for f in
                 ("rans64.cpp", "tans.cpp", "ans_interface.cpp", "lib.cpp")],
         [f"{REF_CSRC}/ans"]),
        ("rans", [f"{REF_CSRC}/rans/rans_interface.cpp"],
         [f"{REF_CSRC}/rans"]),
    ]:
        if f"cbench.{name}" in sys.modules:
            continue
        build_dir, _ = _build(name, srcs, inc)
        spec = importlib.util.spec_from_file_location(
            f"cbench.{name}", os.path.join(build_dir, name + ext))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules[f"cbench.{name}"] = mod

    from cbench.modules.entropy_coder import autoregressive, dist_entropy
    return dist_entropy, autoregressive


GAUSS_CFG = dict(coder_type="rans64", data_range=(0.0, 1.0),
                 data_precision=16, logvar_min=-7.0, logvar_max=0.0,
                 logvar_step=1.0)


def _dump_state(out, prefix, module):
    import torch
    for k, v in module.state_dict().items():
        out[f"{prefix}_w_{k.replace('.', '__')}"] = v.detach().cpu().numpy()


def case_m1(out, dist_entropy):
    import torch
    torch.manual_seed(100)
    coder = dist_entropy.GaussianDistributionEntropyCoder(**GAUSS_CFG)
    coder.eval()
    coder.update_state()
    B, C, H, W = 1, 4, 8, 8
    prior = torch.cat([torch.rand(B, C, H, W, 1),
                       -7.0 * torch.rand(B, C, H, W, 1)], dim=-1)
    data = torch.rand(B, C, H, W)
    freqs, nfreqs, offsets = coder._get_ans_params()
    indexes = coder._select_best_indexes(prior).numpy()
    symbols = coder._data_preprocess_with_prior(data, prior)
    stream = coder.encode(data, prior=prior)
    dec = coder.decode(stream, prior=prior)
    out.update(
        m1_prior=prior.numpy(), m1_data=data.numpy(),
        m1_freqs=freqs, m1_nfreqs=nfreqs, m1_offsets=offsets,
        m1_indexes=indexes, m1_symbols=np.asarray(symbols),
        m1_decoded=dec.numpy(),
        m1_stream=np.frombuffer(stream, np.uint8))


def case_m2(out, dist_entropy):
    import torch
    torch.manual_seed(200)
    coder = dist_entropy.GaussianDistributionEntropyCoder(
        channel_dim=4, use_autoregressive_prior=True,
        ar_method="finitestate", ar_mlp_per_channel=True,
        ar_offsets=[(0, -1, 0), (0, 0, -1)], **GAUSS_CFG)
    coder.eval()
    coder.update_state()
    B, C, H, W = 1, 4, 8, 8
    prior = torch.cat([torch.rand(B, C, H, W, 1),
                       -7.0 * torch.rand(B, C, H, W, 1)], dim=-1)
    data = torch.rand(B, C, H, W)
    freqs, nfreqs, offsets = coder._get_ans_params()
    # the AR lookup table + default bias built inside update_state
    # (dist_entropy.py:563-601): recompute identically for the artifact
    stream = coder.encode(data, prior=prior)
    dec = coder.decode(stream, prior=prior)
    # biased prior (what _select_best_indexes actually sees during coding)
    prior_shape = prior.shape
    biased = prior.movedim(1, -2).reshape(
        prior_shape[0], -1, coder.channel_dim, prior_shape[-1]) \
        + coder.default_ar_prior.unsqueeze(0).unsqueeze(0)
    biased = biased.movedim(-2, 1).reshape(*prior_shape)
    indexes = coder._select_best_indexes(biased).numpy()
    symbols = coder._data_preprocess_with_prior(data, biased)
    ar_indices, ar_offs = coder._get_ar_params(biased)
    _dump_state(out, "m2", coder)
    out.update(
        m2_prior=prior.numpy(), m2_data=data.numpy(),
        m2_freqs=freqs, m2_nfreqs=nfreqs, m2_offsets=offsets,
        m2_default_ar_prior=coder.default_ar_prior.detach().numpy(),
        m2_indexes=indexes, m2_symbols=np.asarray(symbols),
        m2_ar_indices=np.asarray(ar_indices),
        m2_ar_offsets=np.asarray(ar_offs),
        m2_ar_table=np.asarray(coder._last_ar_table)
        if hasattr(coder, "_last_ar_table") else np.zeros(0),
        m2_decoded=dec.numpy(),
        m2_stream=np.frombuffer(stream, np.uint8))
    # also recompute + store the fsar lookup table exactly as update_state
    # does, for direct table-construction comparison
    import itertools
    with torch.no_grad():
        dist_params = coder._init_dist_params()
        categorical_dim = coder.data_precision
        num_dists = len(dist_params)
        lookup_table_shape = [coder.channel_dim, num_dists] + \
            [categorical_dim + 1] * len(coder.ar_offsets)
        ar_states = coder._data_postprocess(np.arange(categorical_dim))
        ar_states = torch.cat(
            [coder._default_sample(ar_states)[0], ar_states], dim=0)
        ar_input_all = list(itertools.product(
            ar_states.tolist(), repeat=coder.ar_window_size))
        ar_input_all = torch.tensor(ar_input_all, dtype=ar_states.dtype)
        ar_input_all = ar_input_all.unsqueeze(0).repeat(coder.channel_dim, 1, 1)
        ar_prior_reshape = torch.stack(
            [mlp(ar_input) for (mlp, ar_input)
             in zip(coder.fsar_mlps_per_channel, ar_input_all)], dim=0)
        default_ar_input = coder._default_sample(ar_input_all).squeeze(-1)
        default_ar_prior_reshape = torch.stack(
            [mlp(ar_input) for (mlp, ar_input)
             in zip(coder.fsar_mlps_per_channel, default_ar_input)], dim=0)
        ar_prior_reshape = ar_prior_reshape - default_ar_prior_reshape
        prior_params = dist_params.unsqueeze(1).unsqueeze(0).type_as(
            ar_prior_reshape) + ar_prior_reshape.unsqueeze(1)
        ar_table = coder._select_best_indexes(prior_params)
        ar_table = ar_table.reshape(*lookup_table_shape).numpy()
    out["m2_lookup_table"] = ar_table


def case_m3(out, dist_entropy):
    import torch
    torch.manual_seed(300)
    coder = dist_entropy.GaussianDistributionEntropyCoder(
        channel_dim=4, use_autoregressive_prior=True,
        ar_method="linear", ar_window_size=2,
        ar_offsets=[(0, -1, 0), (0, 0, -1)],
        ar_output_as_mean_offset=True, **GAUSS_CFG)
    coder.eval()
    coder.update_state()
    B, C, H, W = 1, 4, 8, 8
    prior = torch.cat([torch.rand(B, C, H, W, 1),
                       -7.0 * torch.rand(B, C, H, W, 1)], dim=-1)
    data = torch.rand(B, C, H, W)
    stream = coder.encode(data, prior=prior)
    dec = coder.decode(stream, prior=prior)
    indexes = coder._select_best_indexes(prior).numpy()
    symbols = coder._data_preprocess_with_prior(data, prior)
    ar_indices, ar_offs = coder._get_ar_params(prior)
    _dump_state(out, "m3", coder)
    out.update(
        m3_prior=prior.numpy(), m3_data=data.numpy(),
        m3_indexes=indexes, m3_symbols=np.asarray(symbols),
        m3_ar_indices=np.asarray(ar_indices),
        m3_ar_offsets=np.asarray(ar_offs),
        m3_weight=coder.ar_model.weight.detach().numpy(),
        m3_bias=coder.ar_model.bias.detach().numpy(),
        m3_mean_levels=np.int64(coder.mean_levels),
        m3_logvar_levels=np.int64(coder.logvar_levels),
        m3_decoded=dec.numpy(),
        m3_stream=np.frombuffer(stream, np.uint8))


def case_m5(out, dist_entropy):
    import torch
    torch.manual_seed(500)
    coder = dist_entropy.GaussianDistributionEntropyCoder(
        mean_as_offset=True, **GAUSS_CFG)
    coder.eval()
    coder.update_state()
    B, C, H, W = 1, 4, 8, 8
    prior = torch.cat([torch.rand(B, C, H, W, 1),
                       -7.0 * torch.rand(B, C, H, W, 1)], dim=-1)
    data = torch.rand(B, C, H, W)
    freqs, nfreqs, offsets = coder._get_ans_params()
    indexes = coder._select_best_indexes(prior).numpy()
    symbols = coder._data_preprocess_with_prior(data, prior)
    stream = coder.encode(data, prior=prior)
    dec = coder.decode(stream, prior=prior)
    out.update(
        m5_prior=prior.numpy(), m5_data=data.numpy(),
        m5_freqs=freqs, m5_nfreqs=nfreqs, m5_offsets=offsets,
        m5_indexes=indexes, m5_symbols=np.asarray(symbols),
        m5_decoded=dec.numpy(),
        m5_stream=np.frombuffer(stream, np.uint8))


def case_m6(out, dist_entropy):
    import torch
    torch.manual_seed(600)
    cfg = {k: v for k, v in GAUSS_CFG.items() if k != "coder_type"}
    coder = dist_entropy.GaussianDistributionEntropyCoder(
        coder_type="tans", freq_precision=10, **cfg)
    coder.eval()
    coder.update_state()
    B, C, H, W = 1, 4, 8, 8
    prior = torch.cat([torch.rand(B, C, H, W, 1),
                       -7.0 * torch.rand(B, C, H, W, 1)], dim=-1)
    data = torch.rand(B, C, H, W)
    freqs, nfreqs, offsets = coder._get_ans_params()
    stream = coder.encode(data, prior=prior)
    dec = coder.decode(stream, prior=prior)
    out.update(
        m6_prior=prior.numpy(), m6_data=data.numpy(),
        m6_freqs=freqs, m6_nfreqs=nfreqs, m6_offsets=offsets,
        m6_indexes=coder._select_best_indexes(prior).numpy(),
        m6_decoded=dec.numpy(),
        m6_stream=np.frombuffer(stream, np.uint8))


def case_m8(out):
    import torch
    from cbench.modules.entropy_coder.rans import RansEntropyCoder
    torch.manual_seed(800)
    B, C, H, W = 1, 4, 8, 8
    data = torch.rand(B, C, H, W)
    # gaussian prior format (per-element mean/logvar rows)
    ref_g = RansEntropyCoder(data_range=(0.0, 1.0), data_precision=64,
                             prior_format="gaussian")
    prior_g = torch.cat([torch.rand(B, C, H, W, 1),
                         -5.0 * torch.rand(B, C, H, W, 1)], dim=-1)
    s_g = ref_g.encode(data, prior=prior_g)
    # the expanded probability rows: the float32 exp/softmax here is the
    # one platform-libm-sensitive stage (1-ulp differences flip an
    # occasional quantized count), so the rows ship in the artifact and
    # byte-exactness is asserted from shared rows via prior_format="prob"
    rows_g = ref_g._prior_preprocess(prior_g).reshape(-1, 64)
    # logit prior format (per-element categorical rows)
    ref_l = RansEntropyCoder(data_range=(0.0, 1.0), data_precision=16,
                             prior_format="logit")
    prior_l = torch.randn(B, C, H, W, 16)
    s_l = ref_l.encode(data, prior=prior_l)
    out.update(
        m8_data=data.numpy(),
        m8_gauss_prior=prior_g.numpy(),
        m8_gauss_rows=rows_g.numpy(),
        m8_gauss_stream=np.frombuffer(bytes(s_g), np.uint8),
        m8_gauss_decoded=ref_g.decode(s_g, prior=prior_g).numpy(),
        m8_logit_prior=prior_l.numpy(),
        m8_logit_stream=np.frombuffer(bytes(s_l), np.uint8),
        m8_logit_decoded=ref_l.decode(s_l, prior=prior_l).numpy())


def case_m4(out, autoregressive):
    import torch
    torch.manual_seed(400)
    coder = autoregressive.AutoregressiveEntropyCoder(
        channel_dim=3, data_range=(0.0, 1.0), data_precision=8,
        prior_trainable=True, coder_type="rans")
    with torch.no_grad():
        coder.prior_logprob.uniform_(-2.0, 2.0)
    coder.eval()
    coder.update_state()
    B, C, H, W = 2, 3, 8, 8
    data = torch.rand(B, C, H, W)
    stream = coder.encode(data)
    dec = coder.decode(stream)
    out.update(
        m4_prior_logprob=coder.prior_logprob.detach().numpy(),
        m4_prior_cdfs=np.asarray(coder._prior_cdfs),
        m4_data=data.numpy(),
        m4_decoded=dec.numpy(),
        m4_stream=np.frombuffer(stream, np.uint8))


def main():
    dist_entropy, autoregressive = load_reference_modules()
    out = {}
    case_m1(out, dist_entropy)
    case_m2(out, dist_entropy)
    case_m3(out, dist_entropy)
    case_m4(out, autoregressive)
    case_m5(out, dist_entropy)
    case_m6(out, dist_entropy)
    case_m8(out)
    # preserve previously generated arrays byte-for-byte
    if os.path.exists(OUT):
        old = np.load(OUT)
        for k in old.files:
            if k not in out:
                out[k] = old[k]
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: " + ", ".join(
        f"{k}={len(v)}B" for k, v in out.items() if k.endswith("stream")))


if __name__ == "__main__":
    main()
