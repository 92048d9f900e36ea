"""Experiment-name audit: every named experiment in the reference's
config files resolves to a build here — zero unaccounted names.

The inventory below was extracted mechanically from
/root/reference/configs/*.py `set_override_name(...)` calls (both active
and commented-out entries; the reference keeps several definitions
commented but references their checkpoints from 2-stage flows). When the
reference tree is present the extraction is re-run and cross-checked so
the baked-in list can never silently go stale.

Resolution table: docs/experiment_name_audit.md.
"""
import os
import re
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(ROOT, "configs")
sys.path.insert(0, ROOT)
sys.path.insert(0, CFG)

os.environ.setdefault("CBENCH_SMALL", "1")

REFERENCE_DIR = "/root/reference/configs"

# (file, name, active?) — the complete reference experiment-name inventory
REFERENCE_NAMES = [
    ("lossy_graph_scalable_exp", "lossy-graph-scalable", True),
    ("lossy_graph_scalable_exp_hp",
     "hyperprior-scalable-slimmable-full", False),
    ("lossy_graph_scalable_exp_hp",
     "hyperprior-scalable-slimmable-full-grouped", True),
    ("lossy_graph_scalable_exp_hp",
     "hyperprior-sc-slimmable-full-dynamic-grouped", True),
    ("lossy_graph_scalable_exp_hp",
     "hyperprior-sc-usdecoder-dynamic-grouped", True),
    ("lossy_graph_scalable_exp_hp",
     "hyperprior-sc-groupconv-full-grouped", True),
    ("lossy_graph_scalable_exp_hp",
     "hyperprior-sc-static-backbone-grouped", True),
    ("lossy_graph_scalable_exp_hp", "lossy-graph-scalable-hyperprior", True),
    ("lossy_latent_graph_topogroup", "hyperprior", False),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-base", True),
    ("lossy_latent_graph_topogroup",
     "hyperprior-ar-learned-randprob0.999-g2-s2-p2-ft", True),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-channelwise-g2-ft", True),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-checkerboard-ft", True),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-channelg2-random", False),
    ("lossy_latent_graph_topogroup",
     "hyperprior-ar-learned-g2-s2-p2-ft-random", False),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-channelwise-g4-ft", True),
    ("lossy_latent_graph_topogroup",
     "hyperprior-ar-channelwise-checkerboard-g2-ft", False),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-raster2x2-ft", True),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-channelg4-random", False),
    ("lossy_latent_graph_topogroup",
     "hyperprior-ar-learned-g4-s4-p2-ft-random", True),
    ("lossy_latent_graph_topogroup",
     "hyperprior-ar-learned-g12-s8-p2-ft-random", False),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-channelwise-g10-ft",
     False),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-elic-ft", True),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-channelg12-random",
     False),
    ("lossy_latent_graph_topogroup",
     "hyperprior-ar-learned-g12-s10-p2-ft-random", True),
    ("lossy_latent_graph_topogroup", "hyperprior-ar-scanline-ft", True),
    ("lossy_latent_graph_topogroup_abl", "hyperprior", False),
    ("lossy_latent_graph_topogroup_abl", "hyperprior-ar-base", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-channelwise-g2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-checkerboard-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-interlace-checkerboard-g2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g1-s2-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g2-s2-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g4-s2-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g6-s2-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-cont-learned-param-g2-s2-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-cont-learned-param-g4-s2-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-cont-learned-param-g6-s2-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-k3-randiter1e6-g2-s2-p2-ft", False),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-k7-randiter1e6-g2-s2-p2-ft", False),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-channelwise-g4-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-channelwise-checkerboard-g2-ft", True),
    ("lossy_latent_graph_topogroup_abl", "hyperprior-ar-raster2x2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g1-s4-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g2-s4-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g4-s4-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g6-s4-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g8-s4-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-channelwise-g8-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g2-s8-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g4-s8-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g6-s8-p2-ft", False),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g8-s8-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g12-s8-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-channelwise-g10-ft", True),
    ("lossy_latent_graph_topogroup_abl", "hyperprior-ar-elic-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g4-s10-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g6-s10-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g8-s10-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl",
     "hyperprior-ar-learned-randiter1e6-g12-s10-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl_kernel", "hyperprior", False),
    ("lossy_latent_graph_topogroup_abl_kernel", "hyperprior-ar-base", True),
    ("lossy_latent_graph_topogroup_abl_kernel",
     "hyperprior-ar-learned-k3-randiter4e6-g2-s2-p2-ft", True),
    ("lossy_latent_graph_topogroup_abl_kernel",
     "hyperprior-ar-learned-k7-randiter4e6-g2-s2-p2-ft", True),
    ("trad_lossy", "traditional-image-lossy-codecs", True),
    ("presets/lossy_latent_graph_scalable_ar_models",
     "hyperprior-ar-sc-slimmable-full-dynamic-grouped", True),
    ("presets/lossy_latent_graph_scalable_ar_models",
     "hyperprior-ar-sc-slimmable-full-dynamic-grouped-ft-ssim", True),
    ("presets/lossy_latent_graph_scalable_ar_models",
     "hyperprior-ar-sc-slimmable-full-dynamic-grouped-greedy-search-8level",
     True),
    ("presets/lossy_latent_graph_scalable_ar_models",
     "hyperprior-ar-sc-slimmable-full-dynamic-combined-dynamic-entropy-coder"
     "-grouped", True),
]


def _extract_reference_names(path):
    names = []
    for line in open(path):
        m = re.search(r'set_override_name\("([^"]+)"\)', line)
        if m:
            names.append((m.group(1),
                          not line.lstrip().startswith("#")))
    return names


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference tree not present")
def test_inventory_matches_reference_tree():
    """The baked-in inventory above == a fresh extraction from the
    reference tree (so it cannot go stale undetected)."""
    for fname in ("lossy_graph_scalable_exp_hp", "lossy_latent_graph_topogroup",
                  "lossy_latent_graph_topogroup_abl",
                  "lossy_latent_graph_topogroup_abl_kernel"):
        fresh = _extract_reference_names(
            os.path.join(REFERENCE_DIR, fname + ".py"))
        baked = [(n, a) for f, n, a in REFERENCE_NAMES if f == fname]
        assert sorted(fresh) == sorted(baked), fname
    fresh_p = _extract_reference_names(os.path.join(
        REFERENCE_DIR, "presets", "lossy_latent_graph_scalable_ar_models.py"))
    baked_p = [(n, a) for f, n, a in REFERENCE_NAMES
               if f == "presets/lossy_latent_graph_scalable_ar_models"]
    assert sorted(fresh_p) == sorted(baked_p)


def _abl_module():
    import lossy_latent_graph_topogroup_abl as m
    return m


def _kernel_module():
    import lossy_latent_graph_topogroup_abl_kernel as m
    return m


def _tg_module():
    import lossy_latent_graph_topogroup as m
    return m


def test_every_reference_name_resolves():
    """Zero unaccounted names: each inventory entry maps to a repo build."""
    abl = _abl_module()
    ker = _kernel_module()
    tg = _tg_module()
    from presets.lossy_latent_graph_scalable_ar_models import PRESETS
    import lossy_graph_scalable_exp_hp as hp

    unresolved = []
    for fname, name, _active in REFERENCE_NAMES:
        if fname == "lossy_graph_scalable_exp":
            ok = name == "lossy-graph-scalable"  # configs/lossy_graph_scalable_exp.py
        elif fname == "lossy_graph_scalable_exp_hp":
            ok = (name in hp.REFERENCE_ALIASES
                  or name == "lossy-graph-scalable-hyperprior")
        elif fname == "lossy_latent_graph_topogroup":
            ok = name in tg.REFERENCE_EXPERIMENTS
        elif fname == "lossy_latent_graph_topogroup_abl":
            try:
                abl.resolve_abl_name(name)
                ok = True
            except KeyError:
                ok = False
        elif fname == "lossy_latent_graph_topogroup_abl_kernel":
            ok = (name in ker.REFERENCE_ALIASES or name in ker.ABLATIONS
                  or name == "hyperprior")  # plain baseline lives in abl grid
        elif fname == "trad_lossy":
            ok = True  # configs/trad_lossy.py builds this group
        else:
            ok = name in PRESETS
        if not ok:
            unresolved.append((fname, name))
    assert not unresolved, unresolved


def test_build_every_abl_name_small():
    """Every abl-grid reference name BUILDS a codec (small widths)."""
    abl = _abl_module()
    for _f, name, _a in REFERENCE_NAMES:
        if _f != "lossy_latent_graph_topogroup_abl":
            continue
        codec = abl.abl_codec(name)
        assert codec.params is not None, name


def test_build_every_topogroup_name_small():
    tg = _tg_module()
    for name in tg.REFERENCE_EXPERIMENTS:
        codec = tg.reference_codec(name)
        assert codec.params is not None, name


def test_build_kernel_names_small():
    ker = _kernel_module()
    for _f, name, _a in REFERENCE_NAMES:
        if _f != "lossy_latent_graph_topogroup_abl_kernel":
            continue
        if name == "hyperprior":
            continue  # built through the abl grid's plain-hyperprior entry
        codec = ker.abl_codec(name)
        assert codec.params is not None, name


def test_build_presets_small():
    from presets.lossy_latent_graph_scalable_ar_models import PRESETS
    for name, builder in PRESETS.items():
        grouped = builder(widths=(8, 12), n=16, m=16)
        assert grouped.num_rate_levels >= 4, name
