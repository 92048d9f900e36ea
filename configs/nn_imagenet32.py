"""ImageNet32 NN-model sweep (parity: reference configs/nn_imagenet32.py —
the grouped VQ-VAE prior-model comparison on 32x32 ImageNet: vqvae /
selftrain-gssoft / pyramid (pvq) / channel-split (sp) variants + the plain
VAE, trained and evaluated with the benchmark machinery).

Dataset: ImageNet32 from env.TRAIN_DATA_DIR when present; a 32x32
synthetic stand-in otherwise (zero-egress environments).

Run: python tools/run_benchmark.py configs/nn_imagenet32.py -o /tmp/exp
Env: CBENCH_NN_MODELS=comma,separated to subset; CBENCH_SMALL=1 /
CBENCH_EPOCHS as in nn_standalone.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

from nn_standalone import StandaloneNNExperiment  # noqa: E402

from cbench_basic_tpu.config import ClassBuilder, ParamSlot  # noqa: E402


class ImageNet32Experiment(StandaloneNNExperiment):
    """32x32 geometry (ImageNet32); patches = whole images."""

    image_size = 32

    def __init__(self, **kwargs):
        kwargs.setdefault("patch_size", 32)
        super().__init__(**kwargs)


_MODELS = os.environ.get(
    "CBENCH_NN_MODELS",
    "vae,vqvae,vqvae-gssoft,vqvae-pyramid,vqvae-multi").split(",")

_exp = ClassBuilder(
    ImageNet32Experiment,
    model_name=ParamSlot(
        "model",
        choices=["vae", "vqvae", "vqvae-gssoft", "vqvae-pyramid",
                 "vqvae-multi"],
        default="vqvae"),
).set_override_name("nn_imagenet32")

config = _exp.batch_update_slot_params(model=_MODELS)
