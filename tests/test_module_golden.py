"""MODULE-level golden parity vs the compiled reference implementation.

Round-2 VERDICT item #2: coder-level bit-exactness (ref_golden.npz) left the
module pipeline unchecked — quantization grid, index selection, PMF table
quantization, FSAR lookup construction, default-bias composition, custom
linear AR ops, and stream/header layout. The artifact
(tests/golden/ref_module_golden.npz, regenerable via
tests/golden/generate_reference_module_golden.py against /root/reference)
records the reference modules' full intermediates + bitstreams; these tests
drive the repo's compat layer (cbench_basic_tpu/compat/) over the same
weights and assert byte equality at every boundary.

Cases (reference: cbench/modules/entropy_coder/dist_entropy.py:608-807,
autoregressive.py:368-844):
  m1: Gaussian mean x logvar grid, rans64
  m2: + finite-state AR (per-channel MLP lookup tables, default bias)
  m3: + linear AR (ar_limited_scaled_add_linear_op custom ops)
  m4: categorical coder, trainable prior, CompressAI rans + shape header
  m5: mean_as_offset grid (logvar-only dists, mean-shifted symbols)
"""

import os

import numpy as np
import pytest

from cbench_basic_tpu.compat import (
    RefCategoricalCoder,
    RefFSARPriorConfig,
    RefGaussianGridCoder,
    RefLinearARConfig,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "ref_module_golden.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="module golden artifact missing")


@pytest.fixture(scope="module")
def z():
    return np.load(GOLDEN)


GAUSS_CFG = dict(data_range=(0.0, 1.0), data_precision=16,
                 logvar_min=-7.0, logvar_max=0.0, logvar_step=1.0)


def _mlps_from_weights(z, prefix, channels=4):
    mlps = []
    for c in range(channels):
        layers = []
        for li in (0, 2, 4):
            w = z[f"{prefix}_w_fsar_mlps_per_channel__{c}__{li}__weight"]
            b = z[f"{prefix}_w_fsar_mlps_per_channel__{c}__{li}__bias"]
            layers.append((w, b))
        mlps.append(layers)
    return mlps


def test_m1_plain_grid_module_bitstream(z):
    coder = RefGaussianGridCoder(**GAUSS_CFG)
    freqs, nfreqs, offsets = coder.build_tables()
    np.testing.assert_array_equal(freqs, z["m1_freqs"])
    np.testing.assert_array_equal(nfreqs, z["m1_nfreqs"])
    np.testing.assert_array_equal(offsets, z["m1_offsets"])

    idx = coder.select_indexes(z["m1_prior"])
    np.testing.assert_array_equal(idx, z["m1_indexes"])
    sym = coder.preprocess(z["m1_data"])
    np.testing.assert_array_equal(sym, z["m1_symbols"])

    stream = coder.encode(z["m1_data"], z["m1_prior"])
    assert stream == z["m1_stream"].tobytes()
    dec = coder.decode(stream, z["m1_prior"])
    np.testing.assert_allclose(dec, z["m1_decoded"], atol=1e-6)


def test_m2_fsar_lookup_and_bitstream(z):
    ar = RefFSARPriorConfig(
        mlps=_mlps_from_weights(z, "m2"),
        ar_offsets=np.array([(0, -1, 0), (0, 0, -1)]))
    coder = RefGaussianGridCoder(channel_dim=4, ar=ar, **GAUSS_CFG)

    lookup = coder.build_ar_lookup()
    np.testing.assert_array_equal(lookup, z["m2_lookup_table"])
    np.testing.assert_allclose(coder.default_ar_prior(),
                               z["m2_default_ar_prior"], rtol=0, atol=0)

    freqs, _, _ = coder.build_tables()
    np.testing.assert_array_equal(freqs, z["m2_freqs"])

    biased = coder._coding_prior(z["m2_prior"])
    np.testing.assert_array_equal(coder.select_indexes(biased),
                                  z["m2_indexes"])
    ar_idx, ar_off = coder._ar_args(z["m2_indexes"].shape)
    np.testing.assert_array_equal(np.asarray(ar_off), z["m2_ar_offsets"])

    stream = coder.encode(z["m2_data"], z["m2_prior"])
    assert stream == z["m2_stream"].tobytes()
    dec = coder.decode(stream, z["m2_prior"])
    np.testing.assert_allclose(dec, z["m2_decoded"], atol=1e-6)


def test_m3_linear_ar_ops_bitstream(z):
    ar = RefLinearARConfig(
        weight=z["m3_weight"], bias=z["m3_bias"],
        ar_offsets=np.array([(0, -1, 0), (0, 0, -1)]))
    coder = RefGaussianGridCoder(channel_dim=4, ar=ar, **GAUSS_CFG)
    assert coder.mean_levels == int(z["m3_mean_levels"])
    assert coder.logvar_levels == int(z["m3_logvar_levels"])

    np.testing.assert_array_equal(coder.select_indexes(z["m3_prior"]),
                                  z["m3_indexes"])
    stream = coder.encode(z["m3_data"], z["m3_prior"])
    assert stream == z["m3_stream"].tobytes()
    dec = coder.decode(stream, z["m3_prior"])
    np.testing.assert_allclose(dec, z["m3_decoded"], atol=1e-6)


def test_m4_categorical_header_and_bitstream(z):
    coder = RefCategoricalCoder(z["m4_prior_logprob"],
                                data_range=(0.0, 1.0), data_precision=8)
    np.testing.assert_array_equal(coder.build_cdfs(), z["m4_prior_cdfs"])

    stream = coder.encode(z["m4_data"])
    assert stream == z["m4_stream"].tobytes()
    dec = coder.decode(stream)
    np.testing.assert_allclose(dec, z["m4_decoded"], atol=1e-6)


def test_m5_mean_as_offset_bitstream(z):
    """mean_as_offset: one dist per logvar level, symbols shift by the
    quantized prior mean mod P (dist_entropy.py:657-659, 762-765,
    785-807)."""
    coder = RefGaussianGridCoder(mean_as_offset=True, **GAUSS_CFG)
    freqs, nfreqs, offsets = coder.build_tables()
    np.testing.assert_array_equal(freqs, z["m5_freqs"])
    assert len(freqs) == coder.logvar_levels

    np.testing.assert_array_equal(coder.select_indexes(z["m5_prior"]),
                                  z["m5_indexes"])
    np.testing.assert_array_equal(
        coder._preprocess_with_prior(z["m5_data"], z["m5_prior"]),
        z["m5_symbols"])
    stream = coder.encode(z["m5_data"], z["m5_prior"])
    assert stream == z["m5_stream"].tobytes()
    dec = coder.decode(stream, z["m5_prior"])
    np.testing.assert_allclose(dec, z["m5_decoded"], atol=1e-6)


def test_m6_tans_module_bitstream(z):
    """coder_type="tans": same grid/tables, the tANS/FSE coder backend at
    table_log = freq_precision (entropy_coder/ans.py:142-144)."""
    coder = RefGaussianGridCoder(coder_type="tans", freq_precision=10,
                                 **GAUSS_CFG)
    freqs, _, _ = coder.build_tables()
    np.testing.assert_array_equal(freqs, z["m6_freqs"])
    np.testing.assert_array_equal(coder.select_indexes(z["m6_prior"]),
                                  z["m6_indexes"])
    stream = coder.encode(z["m6_data"], z["m6_prior"])
    assert stream == z["m6_stream"].tobytes()
    dec = coder.decode(stream, z["m6_prior"])
    np.testing.assert_allclose(dec, z["m6_decoded"], atol=1e-6)


def test_m8_rans_prior_module_bitstreams(z):
    """RansEntropyCoder (entropy_coder/rans.py:72-194): per-element prior
    rows through the fast batched cdf quantizer. Byte-exactness is asserted
    from the reference's own expanded rows ("prob" format) — the float32
    exp/softmax row expansion is the one platform-libm-sensitive stage
    (torch vs numpy differ by 1 ulp on ~0.1% of elements), so the row
    computation is checked to 1-ulp instead."""
    from cbench_basic_tpu.compat import RefRansPriorCoder

    # (a) the gaussian row expansion matches to float32 ulp
    g = RefRansPriorCoder(data_range=(0.0, 1.0), data_precision=64,
                          prior_format="gaussian")
    rows = g.prior_rows(z["m8_gauss_prior"])
    np.testing.assert_allclose(rows, z["m8_gauss_rows"], atol=2.4e-7, rtol=0)

    # (b) from the reference's rows: quantizer + coder + layout byte-exact
    p = RefRansPriorCoder(data_range=(0.0, 1.0), data_precision=64,
                          prior_format="prob")
    stream = p.encode(z["m8_data"], z["m8_gauss_rows"].reshape(
        z["m8_data"].shape + (64,)))
    assert stream == z["m8_gauss_stream"].tobytes()
    np.testing.assert_allclose(
        p.decode(stream, z["m8_gauss_rows"].reshape(
            z["m8_data"].shape + (64,))).reshape(z["m8_data"].shape),
        z["m8_gauss_decoded"], atol=1e-6)

    # (c) logit format end-to-end (softmax row expansion + coding)
    l = RefRansPriorCoder(data_range=(0.0, 1.0), data_precision=16,
                          prior_format="logit")
    stream = l.encode(z["m8_data"], z["m8_logit_prior"])
    assert stream == z["m8_logit_stream"].tobytes()
    np.testing.assert_allclose(
        l.decode(stream, z["m8_logit_prior"]).reshape(z["m8_data"].shape),
        z["m8_logit_decoded"], atol=1e-6)
