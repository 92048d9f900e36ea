"""Sub-config: parameter-generator library (parity: reference
configs/nnmodules/layers/param_generator/* — one choice slot over the
generator family, nn/param_generators.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn import param_generators as pg

_FAMILY = {
    "identity": lambda shape, n: pg.IdentityParameterGenerator(),
    "nn_param": lambda shape, n: pg.NNParameterGenerator(shape=tuple(shape)),
    "increasing_vector": lambda shape, n:
        pg.IncreasingVectorGenerator(length=shape[0]),
    "bernoulli": lambda shape, n:
        pg.BernoulliParameterGenerator(shape=tuple(shape)),
    "categorical": lambda shape, n:
        pg.CategoricalParameterGenerator(shape=tuple(shape),
                                         num_categories=n),
    "categorical_to_range": lambda shape, n:
        pg.CategoricalToRangeGenerator(shape=tuple(shape),
                                       num_categories=n),
    "index": lambda shape, n:
        pg.IndexParameterGenerator(values=list(range(n))),
}


def _build(generator="nn_param", shape=(4,), num_categories=2):
    return _FAMILY[generator](tuple(shape), num_categories)


config = ClassBuilder(
    _build,
    generator=ParamSlot("generator", choices=sorted(_FAMILY),
                        default="nn_param"),
    shape=ParamSlot("shape", default=(4,)),
    num_categories=ParamSlot("num_categories", default=2),
).set_override_name("param_generator")
