"""TopoGroup PGM coder sub-config: pattern=learned, ncg=1, context=conv.

Parity: reference configs/codecs/general/prior_models/prior_coders/pgm_topogroup.py
(wraps NNTrainableTopoGroupPriorCoder (learned topogroups))."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), *[os.pardir] * 5))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.topogroup import TopoGroupGaussianCoder

config = ClassBuilder(
    TopoGroupGaussianCoder,
    channels=ParamSlot("channels", default=192),
    pattern=ParamSlot("pattern", default="learned"),
    num_channel_groups=ParamSlot("ncg", default=1),
    context_type=ParamSlot("context_type", default="conv"),
    num_topo_groups=ParamSlot("ntg", default=6),
).add_all_kwargs_as_param_slot().set_override_name("pgm_topogroup")
