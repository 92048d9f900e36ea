"""Traditional lossy codec baselines (parity: reference
configs/trad_lossy.py — PIL JPEG/WebP + external-binary codecs as a grouped
benchmark; BPG/VTM subprocess wrappers engage automatically when the
binaries exist, see cbench_basic_tpu/codecs/binary_codec.py)."""

import os
import shutil
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

from cbench_basic_tpu.bench.benchmark import (
    BasicCompressionBenchmark,
    GroupedCodecBenchmark,
)
from cbench_basic_tpu.codecs.binary_codec import bpg_codec
from cbench_basic_tpu.codecs.pycodecs import PILImageCodec
from cbench_basic_tpu.config import ClassBuilder
from cbench_basic_tpu.config.import_utils import import_config_from_file

_test_data = import_config_from_file(os.path.join(_HERE, "datasets", "kodak.py"))

_QUALITIES = [10, 25, 50, 75, 90]


def _build(output_dir=None, **kw):
    named = [
        ("jpeg", PILImageCodec(format="JPEG", qualities=_QUALITIES)),
        ("webp", PILImageCodec(format="WEBP", qualities=_QUALITIES)),
        ("png", PILImageCodec(format="PNG")),
    ]
    if shutil.which("bpgenc") and shutil.which("bpgdec"):
        named.append(("bpg", bpg_codec()))
    bench = BasicCompressionBenchmark(dataloader=_test_data.build_class())
    return GroupedCodecBenchmark(bench, named, output_dir=output_dir)


config = ClassBuilder(_build).set_override_name("trad_lossy")
