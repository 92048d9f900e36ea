"""Finite-state autoregressive entropy-coder sub-config.

Parity: reference configs/codecs/general/entropy_models/ar.py
(AutoregressiveEntropyCoder/FSAR, entropy_coder/autoregressive.py:37-845).
Builds an FSARCodec — lookup-table/MLP state functions exported into the
native in-loop AR over the rANS/tANS backends — with freshly initialized
parameters (training overwrites them)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 4))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.codecs.fsar import FSARCodec, FSARModel


def _build(channel_dim=1, categorical_dim=256, ar_method="table",
           coder_type="rans", seed=0):
    import jax

    model = FSARModel(channel_dim=channel_dim,
                      categorical_dim=categorical_dim,
                      ar_method=ar_method)
    codec = FSARCodec(model, coder_type=coder_type)
    codec.init_params(jax.random.PRNGKey(seed))
    return codec


config = ClassBuilder(
    _build,
    channel_dim=ParamSlot("channel_dim", default=1),
    categorical_dim=ParamSlot("categorical_dim", default=256),
    ar_method=ParamSlot("ar_method", default="table",
                        choices={"none": "none", "table": "table",
                                 "mlp": "mlp"}),
    coder_type=ParamSlot("coder_type", default="rans",
                         choices={"rans": "rans", "tans": "tans"}),
).set_override_name("ar")
