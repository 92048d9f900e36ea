"""NN lossless-compression experiment: trainable VQ-VAE-family prior
models benchmarked on CIFAR-10-class data.

Parity: reference configs/nn.py (470 LoC): the vqvae / vqvae_v2 /
vqvae_sp / vqvae_pvq(_v2) / vqvae_selftrain(_gssoft/_sp) prior-model
family composed into the general codec, trained through the nn trainer,
and scored by the lossless_compression_trainable benchmark over
torchvision cifar10 (train) / cifar10_test (test) with the torch
dataloader — every piece resolved through the same config sub-library
files the reference imports (:11-43).

Run: python tools/run_benchmark.py configs/nn.py --output-dir <dir>
Env: CBENCH_NN_MODELS=comma,separated subset; CBENCH_EPOCHS / CBENCH_BATCH
shrink the schedule.
`config` is a ClassBuilderList: one experiment dir per prior model.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_HERE, ".."))
sys.path.insert(0, _HERE)

from cbench_basic_tpu.config import ClassBuilder, ParamSlot
from cbench_basic_tpu.config.import_utils import import_config_from_file

_pm_dir = os.path.join(_HERE, "codecs", "general", "prior_models")
_MODELS = ("vqvae", "vqvae_v2", "vqvae_sp", "vqvae_pvq", "vqvae_pvq_v2",
           "vqvae_selftrain", "vqvae_selftrain_gssoft",
           "vqvae_selftrain_sp")

_names = os.environ.get("CBENCH_NN_MODELS")
_names = _names.split(",") if _names else list(_MODELS)

_train_ds = import_config_from_file(
    os.path.join(_HERE, "datasets", "torchvision", "cifar10.py"))
_test_ds = import_config_from_file(
    os.path.join(_HERE, "datasets", "torchvision", "cifar10_test.py"))
_loader = import_config_from_file(
    os.path.join(_HERE, "dataloaders", "torch_inmem.py"))
_loader.update_slot_params(
    dataset=_test_ds.build_class(),
    batch_size=1, shuffle=False)

_trainer_cfg = import_config_from_file(
    os.path.join(_HERE, "trainer", "nn_trainer.py"))

_EPOCHS = int(os.environ.get("CBENCH_EPOCHS", 1))
_BATCH = int(os.environ.get("CBENCH_BATCH", 8))


def _codec(prior_model: str = "vqvae"):
    cfg = import_config_from_file(os.path.join(_pm_dir,
                                               prior_model + ".py"))
    codec = cfg.build_class()
    # selftrain variants carry their own trainer (SelfTrainableInterface)
    if "selftrain" in prior_model and hasattr(codec, "set_trainer"):
        t = _trainer_cfg.clone(copy_slot_data=True)
        t.update_slot_params(num_epochs=_EPOCHS, batch_size=_BATCH)
        codec.set_trainer(t.build_class())
    return codec


# The reference's ACTIVE experiment list is a vqvae_v2 relaxed-categorical
# variant grid (reference configs/nn.py:106-326): dist_type x st-gumbel x
# test-sampling x anneal schemes x kl/commitment ablations. Keyed here so
# each variant is a slot value (stable experiment names), applied as
# nested vqvae_v2 slot overrides in _codec.
_V2_VARIANTS = {
    "base": {},
    "gs_anneal": {"gs_anneal_scheme": "anneal"},
    "gs_relax_anneal": {"gs_anneal_scheme": "anneal",
                        "relax_temp_anneal_scheme": "anneal"},
    "st_samp_anneal": {"use_st_gumbel": True, "test_sampling": True,
                       "gs_anneal_scheme": "anneal",
                       "relax_temp_anneal_scheme": "anneal"},
    "asym_anneal": {"dist_type": "asymptotic",
                    "gs_anneal_scheme": "anneal"},
    "asym_st_anneal": {"dist_type": "asymptotic", "use_st_gumbel": True,
                       "gs_anneal_scheme": "anneal"},
    "asym_samp_anneal": {"dist_type": "asymptotic", "test_sampling": True,
                         "gs_anneal_scheme": "anneal"},
    "asym_st_samp_anneal": {"dist_type": "asymptotic",
                            "use_st_gumbel": True, "test_sampling": True,
                            "gs_anneal_scheme": "anneal"},
    "double_anneal": {"dist_type": "double", "gs_anneal_scheme": "anneal",
                      "relax_temp_anneal_scheme": "anneal"},
    "double_samp_anneal": {"dist_type": "double", "test_sampling": True,
                           "gs_anneal_scheme": "anneal",
                           "relax_temp_anneal_scheme": "anneal"},
    "double_st_anneal": {"dist_type": "double", "use_st_gumbel": True,
                         "gs_anneal_scheme": "anneal",
                         "relax_temp_anneal_scheme": "anneal"},
    "double_st_samp_anneal": {"dist_type": "double", "use_st_gumbel": True,
                              "test_sampling": True,
                              "gs_anneal_scheme": "anneal",
                              "relax_temp_anneal_scheme": "anneal"},
    "st": {"use_st_gumbel": True},
    "samp": {"test_sampling": True},
    "st_samp": {"use_st_gumbel": True, "test_sampling": True},
    "st_kl0": {"use_st_gumbel": True, "kl_cost": 0.0},
    "st_klneg": {"use_st_gumbel": True, "kl_cost": -1.0},
    "st_commit": {"use_st_gumbel": True, "commitment_cost_gs": 0.25},
    "st_commit_kl0": {"use_st_gumbel": True, "commitment_cost_gs": 0.25,
                      "kl_cost": 0.0},
    "commit_exp": {"commitment_cost_gs": 0.25,
                   "commitment_over_exp": True},
    "commit_exp_samp": {"commitment_cost_gs": 0.25,
                        "commitment_over_exp": True,
                        "test_sampling": True},
}


def _codec_v2(variant: str = "base"):
    cfg = import_config_from_file(os.path.join(_pm_dir, "vqvae_v2.py"))
    cfg.update_slot_params(**_V2_VARIANTS[variant])
    return cfg.build_class()


from cbench_basic_tpu.bench.benchmark import BasicCompressionBenchmark

_bench = ClassBuilder(
    BasicCompressionBenchmark,
    codec=ClassBuilder(
        _codec,
        prior_model=ParamSlot("prior_model", choices=list(_MODELS),
                              default="vqvae")),
    dataloader=_loader.build_class(),
    verify_lossless=False,  # lossy VQ reconstruction + rate metric
    compute_distortion=True,
).set_override_name("nn_lossless")

_bench_v2 = ClassBuilder(
    BasicCompressionBenchmark,
    codec=ClassBuilder(
        _codec_v2,
        variant=ParamSlot("variant", choices=sorted(_V2_VARIANTS),
                          default="base")),
    dataloader=_loader.build_class(),
    verify_lossless=False,
    compute_distortion=True,
).set_override_name("nn_lossless_v2")

_variants = os.environ.get("CBENCH_NN_V2_VARIANTS")
_variants = (_variants.split(",") if _variants
             else list(_V2_VARIANTS) if not os.environ.get("CBENCH_NN_MODELS")
             else [])

config = _bench.batch_update_slot_params(prior_model=_names)
if _variants:
    config = config + _bench_v2.batch_update_slot_params(variant=_variants)
