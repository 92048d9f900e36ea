"""Sub-config: real photographs bundled with installed packages.

The zero-egress stand-in for a real test set (Kodak is unavailable):
sklearn's china/flower outdoor photos + matplotlib's grace_hopper portrait.
Used by the real-data RD validation (tests/test_real_photos.py) and as a
`--dataset bundled_photos` choice for experiment configs.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.data.datasets import BundledPhotoDataset

config = ClassBuilder(
    BundledPhotoDataset,
    align=ParamSlot("align", default=64),
    max_items=ParamSlot("max_items", default=None),
).set_override_name("bundled_photos")
