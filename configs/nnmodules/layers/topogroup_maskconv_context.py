"""Layer sub-config: topogroup masked-conv context backbone spec.

Parity: reference configs/nnmodules/layers/
topogroup_maskconv_context.py over
TopoGroupDynamicMaskConv2dContextModel (masked_conv.py) — here the
context kwargs consumed by graph/topogroup.py TopoGroupCoder
(context_type/context_channels/dynamic_kernel...)."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".."))

from cbench_basic_tpu.config import ClassBuilder, ParamSlot


def _build(context_type="conv", context_channels=128, dynamic_kernel=False,
           dynamic_kernel_hidden=64, attn_depth=2, attn_heads=6,
           attn_window=0):
    return dict(context_type=context_type,
                context_channels=context_channels,
                dynamic_kernel=dynamic_kernel,
                dynamic_kernel_hidden=dynamic_kernel_hidden,
                attn_depth=attn_depth, attn_heads=attn_heads,
                attn_window=attn_window)


config = ClassBuilder(
    _build,
    context_type=ParamSlot("context_type",
                           choices=["conv", "attention", "maskconv3d"],
                           default="conv"),
    context_channels=ParamSlot("context_channels", default=128),
    dynamic_kernel=ParamSlot("dynamic_kernel", default=False),
    dynamic_kernel_hidden=ParamSlot("dynamic_kernel_hidden", default=64),
    attn_depth=ParamSlot("attn_depth", default=2),
    attn_heads=ParamSlot("attn_heads", default=6),
    attn_window=ParamSlot("attn_window", default=0),
).set_override_name("topogroup_maskconv_context")
