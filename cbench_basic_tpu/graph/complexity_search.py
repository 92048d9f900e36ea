"""Post-training complexity-level search over PGM slimmable edges.

Parity target: LatentGraphicalANSEntropyCoder.post_training_process greedy /
iterative complexity search (latent_graph.py:1397-1641): evaluate
controller-node (per-edge width) combinations on a search dataset, derive
num_levels complexity levels whose FLOPs interpolate linearly between the
min and max configurations, and store the per-level edge settings.

The searched table feeds LatentGraphCodec.complexity_levels (the analog of
_complexity_param_all_levels, persisted with the checkpoint).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.slimmable import PGMSlimmableEdge


def _edge_input_shape(edge_name: str, src: str, node_specs, image_hw=(256, 256)):
    h, w = image_hw
    c, stride = node_specs[src]
    return (1, h // stride, w // stride, c)


def config_flops(model, node_specs, config: Dict[str, int],
                 image_hw=(256, 256)) -> float:
    """Analytic per-image FLOPs of a {edge: level} configuration."""
    total = 0.0
    wiring = tuple(model.inference_wiring) + tuple(model.generative_wiring)
    for edge_name, src, dst in wiring:
        edge = model.edges[edge_name]
        if isinstance(edge, PGMSlimmableEdge) and edge_name in config:
            shape = _edge_input_shape(edge_name, src, node_specs, image_hw)
            total += edge.transform.flops(shape, config[edge_name])
    return total


class GreedyComplexitySearch:
    """Greedy width-decrement search producing num_levels configurations."""

    def __init__(self, codec, images: Sequence[np.ndarray], num_levels: int = 8,
                 logger=None):
        self.codec = codec
        self.images = images
        self.num_levels = num_levels
        self.logger = logger
        model = codec.model

        @functools.partial(jax.jit, static_argnames=("edge_levels",))
        def eval_loss_fn(p, x, edge_levels):
            kw = {name: {"level": l} for name, l in edge_levels}
            out = model.apply({"params": p}, x, training=False, edge_kwargs=kw)
            from .latent_graph import rd_loss
            num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
            loss, _ = rd_loss(out, num_pixels)
            return loss

        self._eval_loss_fn = eval_loss_fn

        self.edge_names = [
            name for name, e in model.edges.items()
            if isinstance(e, PGMSlimmableEdge)]
        self.num_widths = {
            name: model.edges[name].num_levels for name in self.edge_names}

    def _eval_config(self, config: Dict[str, int]) -> float:
        levels = tuple(sorted(config.items()))
        total = 0.0
        for img in self.images:
            x = jnp.asarray(np.asarray(img), jnp.float32)[None] / 255.0
            total += float(self._eval_loss_fn(self.codec.params, x, levels))
        return total / max(len(self.images), 1)

    def _flops(self, config: Dict[str, int]) -> float:
        return config_flops(self.codec.model, self.codec.node_specs, config)

    def search(self) -> List[Dict[str, int]]:
        max_cfg = {n: self.num_widths[n] - 1 for n in self.edge_names}
        min_cfg = {n: 0 for n in self.edge_names}
        f_max, f_min = self._flops(max_cfg), self._flops(min_cfg)
        targets = np.linspace(f_max, f_min, self.num_levels)

        levels: List[Dict[str, int]] = []
        current = dict(max_cfg)
        for t_idx, target in enumerate(targets):
            # Greedily decrement the edge with the best Δloss/ΔFLOPs until
            # the config fits under the target budget.
            while self._flops(current) > target and any(
                    current[n] > 0 for n in self.edge_names):
                best_name, best_score, best_loss = None, None, None
                for name in self.edge_names:
                    if current[name] == 0:
                        continue
                    cand = dict(current)
                    cand[name] -= 1
                    saved = self._flops(current) - self._flops(cand)
                    if saved <= 0:
                        continue
                    loss = self._eval_config(cand)
                    score = loss / saved  # prefer big savings, small loss
                    if best_score is None or score < best_score:
                        best_name, best_score, best_loss = name, score, loss
                if best_name is None:
                    break
                current[best_name] -= 1
                if self.logger:
                    self.logger.info(
                        f"complexity search: level {t_idx} decrement "
                        f"{best_name} -> {current[best_name]} "
                        f"(loss {best_loss:.4f}, flops {self._flops(current):.3g})")
            levels.append(dict(current))

        levels.reverse()  # level 0 = cheapest, last = full quality
        return levels


def post_training_complexity_search(codec, images, num_levels: int = 8,
                                    logger=None) -> List[Dict[str, int]]:
    """Run the search and install the result on the codec."""
    search = GreedyComplexitySearch(codec, images, num_levels, logger)
    levels = search.search()
    codec.complexity_levels = levels
    codec._complex_level = len(levels) - 1
    return levels
