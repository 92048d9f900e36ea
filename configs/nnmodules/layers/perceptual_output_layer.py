"""Layer sub-config: multi-scale perceptual distortion output layer (PerceptualOutputLayer, cbench/nn/layers/perceptual_output_layer.py).

Parity: reference configs/nnmodules/layers/perceptual_output_layer.py."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.graph.node_coders import NNPerceptualLossyCoder

config = ClassBuilder(
    NNPerceptualLossyCoder,
    lmbda=ParamSlot("lmbda", default=0.01),
    perceptual_weight=ParamSlot("perceptual_weight", default=1000.0),
    feature_channels=ParamSlot("feature_channels", default=24),
    num_scales=ParamSlot("num_scales", default=3),
).set_override_name("perceptual_output_layer")
