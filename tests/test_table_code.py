"""CDF-equalized table-code coding (reference tans_utils.py:305-455 +
fse.py TANSEntropyCoder / TrainablePredCntTANSEntropyCoder): bucketed
codes + residue bits + power-of-two overflow, with the trainable-counts
variant."""

import numpy as np
import pytest

from cbench_basic_tpu.codecs.table_code import (
    TableCodeCodec,
    TrainableTableCodeCodec,
    codes_to_values,
    equalize_cdf_table,
    generate_coding_table,
    values_to_codes,
)


def _geometric(rng, n, p=0.05, cap=100000):
    return np.minimum(rng.geometric(p, n) - 1, cap)


def test_transform_roundtrip_with_overflow():
    rng = np.random.default_rng(0)
    dist = 1.0 / (np.arange(256) + 1.0)
    table, extras = generate_coding_table(dist, max_symbol=64)
    assert len(extras) <= 64
    # values both in range and far past it (overflow bands)
    values = np.concatenate([rng.integers(0, 256, 500),
                             rng.integers(256, 1 << 20, 50)])
    codes, residues = values_to_codes(values, table)
    back = codes_to_values(codes, residues, table)
    np.testing.assert_array_equal(back, values)
    assert codes.max() < len(extras)


def test_equalize_cdf_balances_mass():
    """Codes should carry roughly equal probability mass: a skewed
    distribution gets fine buckets where mass concentrates."""
    dist = np.concatenate([np.full(8, 100.0), np.full(248, 1.0)])
    table = equalize_cdf_table(dist, max_symbol=32)
    # the 8 heavy values spread over more codes than 8 equally-sized
    # buckets of the tail
    heavy_codes = len(np.unique(table[:8]))
    tail_per_code = 248 / max(len(np.unique(table[8:])), 1)
    assert heavy_codes >= 4
    assert tail_per_code > 8


def test_codec_roundtrip_and_rate():
    rng = np.random.default_rng(1)
    train = _geometric(rng, 20000)
    dist = np.bincount(np.minimum(train, 1023), minlength=1024)
    codec = TableCodeCodec(distribution=dist, max_symbol=64)
    values = _geometric(rng, 3000)
    blob = codec.compress(values)
    np.testing.assert_array_equal(codec.decompress(blob), values)
    # rate sanity: well under the 4-byte-raw baseline, near the estimate
    assert len(blob) * 8 < 32 * len(values) * 0.5
    est = codec.estimate_bits(values)
    assert abs(len(blob) * 8 - est) / est < 0.5


def test_trainable_counts_beat_default_table():
    rng = np.random.default_rng(2)
    codec = TrainableTableCodeCodec(value_range=4096, max_symbol=64)
    default_size = len(codec.compress(_geometric(rng, 4000)))
    for _ in range(5):
        codec.train_iter(_geometric(rng, 20000))
    codec.update_state()
    test_vals = _geometric(rng, 4000)
    trained_size = len(codec.compress(test_vals))
    np.testing.assert_array_equal(codec.decompress(
        codec.compress(test_vals)), test_vals)
    assert trained_size < default_size, (trained_size, default_size)
    # parameters persist through the SelfTrainable protocol
    fresh = TrainableTableCodeCodec(value_range=4096, max_symbol=64)
    fresh.load_parameters(codec.get_parameters())
    assert len(fresh.compress(test_vals)) == trained_size
