"""Grouped-benchmark builder: assemble a GroupedCodecBenchmark from a
list of codec ClassBuilders, deriving per-codec row names from each
builder's slot-derived experiment name.

Parity: reference configs/utils/group_benchmark_builder.py
(GroupedCodecBenchmarkBuilder — codec_group_builder + benchmark_builder,
name length limit + hash)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
import hashlib

from cbench_basic_tpu.bench.benchmark import (
    BasicCompressionBenchmark,
    GroupedCodecBenchmark,
)


def build_group_benchmark(codec_builders, dataloader=None,
                          benchmark_builder=None, output_dir=None,
                          codec_name_length_limit=256,
                          codec_name_hash_length=8):
    """codec_builders: iterable of ClassBuilders (or (name, codec) pairs).
    Long derived names are truncated + content-hashed, matching the
    reference's directory-naming scheme."""
    named = []
    for cb in codec_builders:
        if isinstance(cb, tuple):
            name, codec = cb
        else:
            name, codec = getattr(cb, "name", cb.__class__.__name__),                 cb.build_class()
        if len(name) > codec_name_length_limit:
            digest = hashlib.md5(name.encode()).hexdigest()
            name = (name[: codec_name_length_limit - codec_name_hash_length]
                    + digest[:codec_name_hash_length])
        named.append((name, codec))
    base = (benchmark_builder.build_class() if benchmark_builder is not None
            else BasicCompressionBenchmark(None, dataloader,
                                           compute_distortion=False,
                                           verify_lossless=True))
    return GroupedCodecBenchmark(base, named, output_dir=output_dir)


config = ClassBuilder(
    build_group_benchmark,
    codec_builders=ParamSlot("codec_builders", default=()),
    dataloader=ParamSlot("dataloader", default=None),
    benchmark_builder=ParamSlot("benchmark_builder", default=None),
    codec_name_length_limit=ParamSlot("codec_name_length_limit",
                                      default=256),
    codec_name_hash_length=ParamSlot("codec_name_hash_length", default=8),
).set_override_name("group_benchmark")
