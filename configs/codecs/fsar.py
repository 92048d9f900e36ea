"""Sub-config: FSAR lossless categorical codec."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from cbench_basic_tpu.codecs.fsar import FSARCodec, FSARModel
from cbench_basic_tpu.config import ClassBuilder, ParamSlot


def _build(ar_method="table", categorical_dim=256, channel_dim=1,
           window=1, coder_type="rans", seed=0):
    offs = tuple((-(i + 1), 0) for i in range(window))
    model = FSARModel(channel_dim=channel_dim, categorical_dim=categorical_dim,
                      ar_method=ar_method, ar_offsets=offs)
    codec = FSARCodec(model, coder_type=coder_type)
    codec.init_params(jax.random.PRNGKey(seed),
                      sample_shape=(1, 16, channel_dim))
    return codec


config = ClassBuilder(
    _build,
    ar_method=ParamSlot("ar_method", choices=["none", "table", "mlp"],
                        default="table"),
    categorical_dim=ParamSlot("K", default=256),
    channel_dim=ParamSlot("C", default=1),
    window=ParamSlot("window", default=1),
    coder_type=ParamSlot("coder_type", choices=["rans", "tans"],
                         default="rans"),
).set_override_name("fsar")
