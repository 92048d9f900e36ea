"""Sub-config: analysis/synthesis transform builders with slots
(parity: reference configs/nnmodules/** layer configs)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.nn.models.hyperprior import (
    AnalysisTransform,
    HyperAnalysisTransform,
    HyperSynthesisTransform,
    SynthesisTransform,
)

analysis = ClassBuilder(
    AnalysisTransform,
    N=ParamSlot("N", default=192),
    M=ParamSlot("M", default=192),
    num_stages=ParamSlot("num_stages", default=4),
).set_override_name("analysis")

synthesis = ClassBuilder(
    SynthesisTransform,
    N=ParamSlot("N", default=192),
    num_stages=ParamSlot("num_stages", default=4),
).set_override_name("synthesis")

hyper_analysis = ClassBuilder(
    HyperAnalysisTransform,
    N=ParamSlot("N", default=192),
    use_abs=ParamSlot("use_abs", default=False),
).set_override_name("hyper_analysis")

hyper_synthesis = ClassBuilder(
    HyperSynthesisTransform,
    N=ParamSlot("N", default=192),
    out_channels=ParamSlot("out_channels", default=384),
).set_override_name("hyper_synthesis")

config = analysis
