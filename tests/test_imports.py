"""Package import smoke test (parity: reference tests/import_test.py:5-16,
which checks all packages incl. the compiled coder modules)."""

import importlib

import pytest

MODULES = [
    "cbench_basic_tpu",
    "cbench_basic_tpu.coding",
    "cbench_basic_tpu.compat",
    "cbench_basic_tpu.compat.ref_gaussian",
    "cbench_basic_tpu.compat.ref_categorical",
    "cbench_basic_tpu.compat.ref_rans_prior",
    "cbench_basic_tpu.nn.groupconv",
    "cbench_basic_tpu.nn.param_generators",
    "cbench_basic_tpu.codecs.table_code",
    "cbench_basic_tpu.codecs.lz77_dict_training",
    "cbench_basic_tpu.prior_coders.stochastic_vq_ar",
    "cbench_basic_tpu.bench.task_models",
    "cbench_basic_tpu.coding.rans",
    "cbench_basic_tpu.coding.tans",
    "cbench_basic_tpu.coding.ar_utils",
    "cbench_basic_tpu.coding.ar_transforms",
    "cbench_basic_tpu.ops.image_metrics",
    "cbench_basic_tpu.ops.rans_device",
    "cbench_basic_tpu.nn.layers",
    "cbench_basic_tpu.nn.slimmable",
    "cbench_basic_tpu.nn.entropy_models",
    "cbench_basic_tpu.nn.distributions",
    "cbench_basic_tpu.nn.models",
    "cbench_basic_tpu.nn.models.vqvae",
    "cbench_basic_tpu.graph",
    "cbench_basic_tpu.graph.complexity_search",
    "cbench_basic_tpu.graph.combined_coder",
    "cbench_basic_tpu.codecs",
    "cbench_basic_tpu.codecs.graph_codec",
    "cbench_basic_tpu.codecs.neural",
    "cbench_basic_tpu.codecs.lossless",
    "cbench_basic_tpu.codecs.entropy_codecs",
    "cbench_basic_tpu.codecs.general_codec",
    "cbench_basic_tpu.codecs.tiled",
    "cbench_basic_tpu.codecs.vq_codec",
    "cbench_basic_tpu.bench.benchmark",
    "cbench_basic_tpu.bench.metrics",
    "cbench_basic_tpu.data",
    "cbench_basic_tpu.data.extra_datasets",
    "cbench_basic_tpu.config",
    "cbench_basic_tpu.train.trainer",
    "cbench_basic_tpu.train.basic_trainer",
    "cbench_basic_tpu.train.schedulers",
    "cbench_basic_tpu.utils.engine",
    "cbench_basic_tpu.utils.bytes_ops",
]


@pytest.mark.parametrize("name", MODULES)
def test_import(name):
    importlib.import_module(name)


def test_native_library_symbols():
    from cbench_basic_tpu.coding.rans import _lib
    for sym in ("rans_ctx_new", "rans_encode_with_indexes", "rans_flush",
                "rans_encode_interleaved", "tans_ctx_new",
                "tans_encode_with_indexes", "ar_transform_mean_forward"):
        assert hasattr(_lib, sym), sym
