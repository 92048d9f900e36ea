"""Comparison preset: BaSIC scalable models vs traditional codecs.

Parity: reference configs/presets/lossy_latent_graph_scalable_comp.py
(imports pycodecs/pil_webp + binary_codecs/bpg beside the scalable
models): a grouped benchmark putting WebP / JPEG (and BPG when its
binaries exist) on the same rate axis as the BaSIC groups.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.codecs.pycodecs import PILImageCodec
from cbench_basic_tpu.config.import_utils import import_config_from_file


def comparison_codecs(include_neural: bool = True, small: bool = False):
    """(name, codec) rows for GroupedCodecBenchmark."""
    rows = [
        ("webp", PILImageCodec("WEBP", qualities=[10, 25, 50, 75, 90])),
        ("jpeg", PILImageCodec("JPEG", qualities=[10, 25, 50, 75, 90])),
    ]
    try:
        bpg = import_config_from_file(os.path.join(
            _HERE, "..", "codecs", "binary_codecs", "bpg.py"))
        rows.append(("bpg", bpg.build_class()))
    except FileNotFoundError:
        pass  # binaries absent (zero-egress image)
    if include_neural:
        sys.path.insert(0, _HERE)
        from lossy_latent_graph_scalable_ar_models import (
            hyperprior_ar_sc_slimmable_full_dynamic_grouped,
        )
        kw = dict(widths=(4, 6), n=8, m=12) if small else {}
        rows.append(("basic-scalable",
                     hyperprior_ar_sc_slimmable_full_dynamic_grouped(**kw)))
    return rows
