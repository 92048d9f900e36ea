"""Pretrained-model builder: build a flax module and restore parameters
from a local checkpoint (pickle / msgpack), cached per path.

Parity: reference configs/utils/pretrained_model_builder.py
(PretrainedModelBuilder — download-and-cache; zero-egress here, so the
checkpoint must already be on disk)."""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
_CACHE = {}


def load_pretrained(model, checkpoint_path, cache=True):
    """Returns (model, params). params=None when the checkpoint is absent
    (caller decides whether to init fresh or fail)."""
    if checkpoint_path in _CACHE:
        return model, _CACHE[checkpoint_path]
    params = None
    if checkpoint_path and os.path.isfile(checkpoint_path):
        if checkpoint_path.endswith(".msgpack"):
            from flax import serialization
            with open(checkpoint_path, "rb") as f:
                params = serialization.msgpack_restore(f.read())
        else:
            import pickle
            with open(checkpoint_path, "rb") as f:
                params = pickle.load(f)
        if cache:
            _CACHE[checkpoint_path] = params
    return model, params


config = ClassBuilder(
    load_pretrained,
    model=ParamSlot("model", default=None),
    checkpoint_path=ParamSlot("checkpoint_path", default=None),
    cache=ParamSlot("cache", default=True),
).set_override_name("pretrained_model")
