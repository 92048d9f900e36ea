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
    """Greedy width-decrement search producing num_levels configurations.

    ``anchor_uniform=True`` additionally scores every uniform-width
    configuration that fits the level's budget and keeps it if it beats the
    greedy pick. Rationale (measured, docs/performance.md round-4 scalable
    section): a loss-only greedy decrement path can land on a
    wide-analysis/narrow-synthesis mix that decodes WORSE than the uniform
    narrow config at nearly the same rate — a failure mode the reference's
    own search shares (latent_graph.py:1537-1573 scores candidates by loss
    alone). Uniform configs are the strongest sandwich-trained operating
    points, so they belong in the candidate pool as anchors.
    """

    def __init__(self, codec, images: Sequence[np.ndarray], num_levels: int = 8,
                 logger=None, anchor_uniform: bool = False):
        self.codec = codec
        self.images = images
        self.num_levels = num_levels
        self.logger = logger
        self.anchor_uniform = anchor_uniform
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

    def _uniform_configs(self) -> List[Dict[str, int]]:
        """One config per width index, clamped per edge; deduped, cheap first."""
        if not self.edge_names:
            return []
        max_w = max(self.num_widths[n] for n in self.edge_names)
        seen, out = set(), []
        for w in range(max_w):
            cfg = {n: min(w, self.num_widths[n] - 1) for n in self.edge_names}
            key = tuple(sorted(cfg.items()))
            if key not in seen:
                seen.add(key)
                out.append(cfg)
        return out

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
            # t_idx 0 is the full-quality level: always max_cfg, never an
            # anchor (parity with the iterative search + reference ladder).
            if self.anchor_uniform and t_idx > 0:
                pool = [dict(current)] + [
                    cfg for cfg in self._uniform_configs()
                    if self._flops(cfg) <= target and cfg != current]
                scored = [(self._eval_config(cfg), cfg) for cfg in pool]
                best_loss, best_cfg = min(scored, key=lambda s: s[0])
                if best_cfg != current and self.logger:
                    self.logger.info(
                        f"complexity search: level {t_idx} uniform anchor "
                        f"{best_cfg} beats greedy {current} "
                        f"(loss {best_loss:.4f})")
                current = dict(best_cfg)
            levels.append(dict(current))

        levels.reverse()  # level 0 = cheapest, last = full quality
        return levels


class IterativeComplexitySearch(GreedyComplexitySearch):
    """Reference-parity iterative search (latent_graph.py:1480-1641):

    * `_recursive_reduce` enumerates ALL width configurations inside each
      (target_min, target] complexity band reachable by decrements from the
      current configuration (the reference's `_recursive_reduce_complexity_idx`,
      :1463-1478), evaluates each candidate's performance and keeps the best
      — instead of the single greedy decrement path.
    * `controller_edges` restricts the search to a subset of the slimmable
      edges (the reference's complexity_level_controller_nodes).
    * `complexity_metric`: "flops" (analytic), or measured
      "compress_time" / "decompress_time" / "coding_time" — wall-clock of
      the real coding path at that configuration (the reference's
      complexity_level_greedy_search_complexity_metric).
    * `custom_targets`: explicit complexity budgets replacing the linear
      interpolation (complexity_level_greedy_search_custom_constraint).
    """

    def __init__(self, codec, images: Sequence[np.ndarray],
                 num_levels: int = 8, logger=None,
                 controller_edges: Sequence[str] = None,
                 complexity_metric: str = "flops",
                 custom_targets: Sequence[float] = None,
                 max_candidates: int = 64,
                 anchor_uniform: bool = False):
        super().__init__(codec, images, num_levels, logger,
                         anchor_uniform=anchor_uniform)
        if controller_edges is not None:
            unknown = set(controller_edges) - set(self.edge_names)
            if unknown:
                raise ValueError(f"unknown controller edges: {unknown}")
            self.edge_names = list(controller_edges)
        self.complexity_metric = complexity_metric
        self.custom_targets = custom_targets
        self.max_candidates = max_candidates

    # -- complexity metrics ----------------------------------------------------
    def _complexity(self, config: Dict[str, int]) -> float:
        if self.complexity_metric == "flops":
            return self._flops(config)
        return self._measure_coding_time(config)

    def _measure_coding_time(self, config: Dict[str, int]) -> float:
        """Median wall time (s) of the real coding path at this config."""
        import time
        codec = self.codec
        saved_levels = codec.complexity_levels
        saved_idx = codec._complex_level
        try:
            codec.complexity_levels = [dict(config)]
            codec.set_complex_level(0)
            codec._ensure_ready()
            img = np.asarray(self.images[0])
            codec.compress(img)  # warmup/compile
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                stream = codec.compress(img)
                t1 = time.perf_counter()
                codec.decompress(stream)
                t2 = time.perf_counter()
                if self.complexity_metric == "compress_time":
                    times.append(t1 - t0)
                elif self.complexity_metric == "decompress_time":
                    times.append(t2 - t1)
                else:  # coding_time
                    times.append(t2 - t0)
            return float(np.median(times))
        finally:
            codec.complexity_levels = saved_levels
            codec._complex_level = saved_idx
            if saved_levels:
                codec.set_complex_level(saved_idx)

    # -- candidate enumeration -------------------------------------------------
    def _recursive_reduce(self, config: Dict[str, int], target: float,
                          target_min: float,
                          found: Dict[tuple, float]) -> Dict[tuple, float]:
        """Enumerate decremented configs until complexity <= target; keep
        those above target_min (the next level's budget)."""
        for name in self.edge_names:
            if config[name] == 0 or len(found) >= self.max_candidates:
                continue
            cand = dict(config)
            cand[name] -= 1
            key = tuple(sorted(cand.items()))
            if key in found:
                continue
            c = self._complexity(cand)
            if c > target:
                found = self._recursive_reduce(cand, target, target_min, found)
            elif c > target_min:
                found[key] = c
        return found

    def search(self) -> List[Dict[str, int]]:
        max_cfg = {n: self.num_widths[n] - 1 for n in self.edge_names}
        min_cfg = {n: 0 for n in self.edge_names}
        c_max, c_min = self._complexity(max_cfg), self._complexity(min_cfg)
        if self.custom_targets is not None:
            interior = list(self.custom_targets)
        else:
            interior = list(c_max - np.arange(1, self.num_levels - 1)
                            / (self.num_levels - 1) * (c_max - c_min))
        if self.logger:
            self.logger.info(
                f"iterative search: complexity range [{c_min:.4g}, "
                f"{c_max:.4g}] ({self.complexity_metric}), "
                f"targets {interior}")

        levels = [dict(max_cfg)]
        current = dict(max_cfg)
        bands = interior + [c_min]
        for t_idx, target in enumerate(interior):
            target_min = bands[t_idx + 1]
            found = self._recursive_reduce(current, target, target_min, {})
            if not found:  # relax the lower bound (reference :1553-1558)
                found = self._recursive_reduce(current, target, -np.inf, {})
            if self.anchor_uniform:
                # Uniform-width anchors enter every band they fit under
                # (allowed to undershoot the budget — they are anchors).
                for cfg in self._uniform_configs():
                    if self._complexity(cfg) <= target:
                        found.setdefault(tuple(sorted(cfg.items())),
                                         self._complexity(cfg))
            best_cfg, best_loss = None, np.inf
            for key in found:
                cand = dict(key)
                loss = self._eval_config(cand)
                if loss < best_loss:
                    best_cfg, best_loss = cand, loss
            if best_cfg is None:
                best_cfg = dict(min_cfg)
            if self.logger:
                self.logger.info(
                    f"level target {target:.4g}: {len(found)} candidates, "
                    f"best loss {best_loss:.4f} at {best_cfg}")
            levels.append(best_cfg)
            current = best_cfg
        levels.append(dict(min_cfg))
        levels.reverse()  # level 0 = cheapest
        return levels


def post_training_complexity_search(codec, images, num_levels: int = 8,
                                    logger=None, method: str = "greedy",
                                    enforce_monotone: bool = False,
                                    **search_kwargs) -> List[Dict[str, int]]:
    """Run the search and install the result on the codec.

    method: "greedy" (single-decrement path) or "iterative" (reference
    band-enumeration parity, latent_graph.py:1536-1641) — extra kwargs
    (controller_edges, complexity_metric, custom_targets, anchor_uniform)
    flow to the searcher.

    enforce_monotone: repair pass the reference lacks — walking the ladder
    cheapest -> full, any level whose eval loss is WORSE than a cheaper
    level is replaced by that cheaper level's config. Guarantees users
    never pay more compute for worse quality; FLOPs stay non-decreasing
    because the replacement is itself cheaper than the level it replaces.
    """
    if method == "iterative":
        search = IterativeComplexitySearch(codec, images, num_levels, logger,
                                           **search_kwargs)
    else:
        search = GreedyComplexitySearch(codec, images, num_levels, logger,
                                        **search_kwargs)
    levels = search.search()
    if enforce_monotone and len(levels) > 1:
        losses = [search._eval_config(cfg) for cfg in levels]
        for i in range(1, len(levels)):
            if losses[i] > losses[i - 1]:
                if logger:
                    logger.info(
                        f"monotone repair: level {i} (loss {losses[i]:.4f}) "
                        f"-> level {i-1}'s config (loss {losses[i-1]:.4f})")
                levels[i] = dict(levels[i - 1])
                losses[i] = losses[i - 1]
    codec.complexity_levels = levels
    codec._complex_level = len(levels) - 1
    return levels
