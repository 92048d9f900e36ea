"""Config import helpers (parity: reference configs/import_utils.py).

A config file is a Python module defining a top-level ``config`` object
(usually a ClassBuilder). ``import_config_from_file`` execs it;
``import_class_builder_from_module`` pulls the builder out of an imported
module; ``import_all_config_from_dir`` turns a directory of config modules
into a choices dict.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
from pathlib import Path
from typing import Any, Dict


def import_config_from_file(path: str, attr: str = "config") -> Any:
    path = Path(path)
    # Namespace the sys.modules key: config files legitimately shadow
    # package names (dataloaders/torch.py, datasets/… ) and a bare-stem
    # registration would hijack later `import torch` etc.
    mod_name = "cbench_cfg__" + "__".join(path.resolve().parts[-3:])[:-3]
    spec = importlib.util.spec_from_file_location(mod_name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = module
    spec.loader.exec_module(module)
    return getattr(module, attr)


def import_config_from_module(module, attr: str = "config") -> Any:
    if isinstance(module, str):
        module = importlib.import_module(module)
    return getattr(module, attr)


def import_class_builder_from_module(module, attr: str = "config"):
    return import_config_from_module(module, attr)


def import_all_config_from_dir(dir_path: str, attr: str = "config") -> Dict[str, Any]:
    out = {}
    for p in sorted(Path(dir_path).glob("*.py")):
        if p.stem.startswith("_"):
            continue
        try:
            out[p.stem] = import_config_from_file(str(p), attr)
        except Exception:
            continue
    return out
