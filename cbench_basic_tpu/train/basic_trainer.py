"""Non-NN trainer (parity: reference cbench/benchmark/trainer.py:15-130
BasicTrainer): full-data or iterative training of classical trainables
(e.g. zstd dictionaries, histogram tables) with pickled parameters."""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

from ..utils.engine import BaseEngine, locked_file


class TrainableInterface:
    """Parity: TrainableModuleInterface (modules/base.py:6-34)."""

    def train_full(self, dataloader) -> None:
        raise NotImplementedError

    def train_iter(self, data) -> None:
        raise NotImplementedError

    def get_parameters(self) -> Any:
        raise NotImplementedError

    def load_parameters(self, params: Any) -> None:
        raise NotImplementedError

    def post_training_process(self) -> None:
        return None


class BasicTrainer(BaseEngine):
    """Trains a TrainableInterface over a dataloader; params pickle to
    params.pkl with locked writes; skips training when a checkpoint
    exists (resume semantics)."""

    def __init__(self, dataloader=None, mode: str = "full",
                 num_iters: Optional[int] = None, **kwargs):
        super().__init__(**kwargs)
        self.dataloader = dataloader
        self.mode = mode
        self.num_iters = num_iters

    def _params_path(self):
        return self.output_path("params.pkl") if self.output_dir else None

    def train_module(self, module: TrainableInterface):
        path = self._params_path()
        if path and os.path.exists(path):
            with open(path, "rb") as f:
                module.load_parameters(pickle.load(f))
            self.logger.info("loaded existing params.pkl; skipping training")
            return module
        if self.mode == "full":
            module.train_full(self.dataloader)
        else:
            for i, data in enumerate(self.dataloader):
                module.train_iter(data)
                if self.num_iters is not None and i + 1 >= self.num_iters:
                    break
        module.post_training_process()
        if path:
            with locked_file(path, "wb") as f:
                pickle.dump(module.get_parameters(), f)
        return module
