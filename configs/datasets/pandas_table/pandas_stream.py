"""Dataset sub-config: pandas table rows serialized per-row to bytes.

Parity: reference configs/datasets/pandas_table/pandas_stream.py over the
pandas dataset + serialize choice dirs (serialize/csv.py, json.py).
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.config.import_utils import import_all_config_from_dir
from cbench_basic_tpu.data.extra_datasets import PandasTableDataset

SERIALIZE = import_all_config_from_dir(os.path.join(_HERE, "serialize"))


def _build(path="data/table.csv", serialize=None, max_items=None):
    kw = dict(SERIALIZE.get(serialize or "csv", SERIALIZE["csv"]))
    if not os.path.isfile(path):
        # synthetic stand-in table (zero-egress)
        import tempfile

        import numpy as np
        import pandas as pd
        rng = np.random.default_rng(0)
        df = pd.DataFrame({"a": rng.integers(0, 100, 64),
                           "b": rng.random(64).round(3)})
        tmp = os.path.join(tempfile.gettempdir(), "cbench_table.csv")
        df.to_csv(tmp, index=False)
        path = tmp
    return PandasTableDataset(path, max_items=max_items, **kw)


config = ClassBuilder(
    _build,
    path=ParamSlot("path", default="data/table.csv"),
    serialize=ParamSlot("serialize", default="csv",
                        choices=sorted(SERIALIZE) or ["csv"]),
    max_items=ParamSlot("max_items", default=None),
).set_override_name("pandas_stream")
