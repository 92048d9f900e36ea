"""Dynamic-node product iteration, sandwich relative-FLOPs loss, and
lambda-FLOPs auto-adjustment.

Parity targets (reference cbench/modules/entropy_coder/latent_graph.py):
  * :898-1078 — dynamic-node product iteration: per training step each
    dynamic axis (sclevel, vrlevel, ...) is sampled (full product at eval),
    the forward runs once per combination, and each combination's losses /
    metrics get a per-combination logging prefix ("sclevel=2_vrlevel=0_").
  * :919-921 + :940-1000 — sandwich self-supervised training: the max
    configuration runs first and the min configuration last, and with
    use_relative_flops_loss the mid combinations' (rate+distortion) loss and
    FLOPs are NORMALIZED between the detached min/max endpoints.
  * :1136-1166 — auto_adjust_lambda_flops: "linear" tracks running
    min/max FLOPs-per-dim and nudges the FLOPs-loss weight toward a
    per-sclevel target; "rejection" skips optimizer updates for steps whose
    FLOPs overshoot the target.

TPU-first: every combination is a STATIC jit specialization (edge widths
are static arguments), so one train step with C combinations compiles into
one XLA program with C fused forward/backward passes; the λ auto-adjust
state lives on the host (two floats) and enters the step as traced scalars
— no recompilation as it adapts.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class DynamicAxis:
    """One dynamic configuration axis (the functional analog of a reference
    dynamic-node generator, param_generator.py).

    values: the axis's configurations in INCREASING capability order
    (values[0] = min, values[-1] = max).
    fix_for_inference: evaluate only the fixed default instead of iterating.
    """

    def __init__(self, name: str, values: Sequence[Any],
                 fix_for_inference: bool = False, default_index: int = -1):
        if not values:
            raise ValueError(f"axis {name} needs at least one value")
        self.name = name
        self.values = list(values)
        self.fix_for_inference = fix_for_inference
        self.default_index = default_index % len(self.values)

    def sample_index(self, rng: np.random.Generator) -> int:
        return int(rng.integers(len(self.values)))

    def eval_indices(self) -> List[int]:
        if self.fix_for_inference:
            return [self.default_index]
        return list(range(len(self.values)))


class Combo(Tuple):
    """(axis_name -> value index) combination with its logging prefix."""


def product_step_combos(axes: Sequence[DynamicAxis], rng: np.random.Generator,
                        sandwich: bool = False,
                        training: bool = True) -> List[Dict[str, int]]:
    """Per-step combination list.

    Training: one sampled index per axis; with sandwich, the all-max combo
    is prepended and the all-min combo appended (reference :919-921 inserts
    the range max first and appends the min). Eval: the full product.
    """
    if training:
        mid = {ax.name: ax.sample_index(rng) for ax in axes}
        combos = [mid]
        if sandwich:
            hi = {ax.name: len(ax.values) - 1 for ax in axes}
            lo = {ax.name: 0 for ax in axes}
            combos = [hi] + combos + [lo]
        # dedup while keeping order (sampled combo may equal an endpoint)
        seen, out = set(), []
        for c in combos:
            key = tuple(sorted(c.items()))
            if key not in seen:
                seen.add(key)
                out.append(c)
        return out
    import itertools
    names = [ax.name for ax in axes]
    out = []
    for idxs in itertools.product(*(ax.eval_indices() for ax in axes)):
        out.append(dict(zip(names, idxs)))
    return out


def combo_prefix(combo: Dict[str, int]) -> str:
    """Reference-style logging prefix: "sclevel=2_vrlevel=0_"."""
    return "".join(f"{k}={v}_" for k, v in sorted(combo.items()))


class ProductLoss:
    """Multi-combination RD loss with optional relative-FLOPs sandwich.

    sc_axis values: edge-level tuples (static width configs; None = soft
    mixture). vr_axis values: λ rate weights entering as a traced per-node
    kwarg on the x node. More axes can be added through extra_axes with a
    node_kwargs_fn mapping value -> per-node traced kwargs.
    """

    def __init__(self, codec, sc_axis: Optional[DynamicAxis] = None,
                 vr_axis: Optional[DynamicAxis] = None,
                 sandwich: bool = False,
                 relative_flops: bool = False,
                 relative_flops_lambdas: Optional[Sequence[float]] = None):
        self.codec = codec
        self.sc_axis = sc_axis
        self.vr_axis = vr_axis
        self.axes = [ax for ax in (sc_axis, vr_axis) if ax is not None]
        self.sandwich = sandwich or relative_flops
        self.relative_flops = relative_flops
        self.relative_flops_lambdas = relative_flops_lambdas
        if relative_flops and (sc_axis is None or len(sc_axis.values) < 2):
            raise ValueError("relative_flops needs an sc axis with >=2 levels")

    def step_combos(self, rng: np.random.Generator,
                    training: bool = True) -> Tuple[Tuple[Tuple[str, int], ...], ...]:
        """Hashable (static-arg) combination tuple for this step."""
        combos = product_step_combos(self.axes, rng, self.sandwich, training)
        return tuple(tuple(sorted(c.items())) for c in combos)

    def _combo_args(self, combo: Dict[str, int], lmbda_override=None):
        edge_levels = None
        node_kwargs: Dict[str, Dict[str, Any]] = {}
        if self.sc_axis is not None:
            edge_levels = self.sc_axis.values[combo[self.sc_axis.name]]
        if self.vr_axis is not None:
            lam = self.vr_axis.values[combo[self.vr_axis.name]]
            if isinstance(lam, dict):
                # gain-vector rate axis: {"lmbda": ..., "vrlevel": ...} — λ
                # weights the x distortion, vrlevel selects the y coder's
                # gain vectors (one-model variable rate, autoencoder v2).
                if "lmbda" in lam:
                    node_kwargs.setdefault("x", {})["lmbda"] = jnp.float32(
                        lam["lmbda"])
                if "vrlevel" in lam:
                    node_kwargs.setdefault("y", {})["vrlevel"] = jnp.float32(
                        lam["vrlevel"])
            else:
                node_kwargs.setdefault("x", {})["lmbda"] = jnp.float32(lam)
        if lmbda_override is not None:
            node_kwargs.setdefault("x", {})["lmbda"] = lmbda_override
        return edge_levels, (node_kwargs or None)

    def __call__(self, params, batch, rng, combos,
                 flops_loss_mult=None, node_kwargs=None):
        """Total loss over the step's combinations.

        combos: the static tuple from step_combos. flops_loss_mult: traced
        scalar scaling the FLOPs loss term (λC auto-adjust); None = 1.
        node_kwargs: scheduled per-node kwargs (trainer param_schedulers,
        e.g. annealed temperature) applied to EVERY combination; per-combo
        kwargs (λ, vrlevel) override the scheduled defaults per key.
        Returns (loss, metrics) with per-combination prefixed metrics.
        """
        import jax

        combos = [dict(c) for c in combos]
        total = 0.0
        metrics: Dict[str, Any] = {}

        def run(i, combo):
            edge_levels, combo_nk = self._combo_args(combo)
            if node_kwargs:
                merged = {n: dict(kw) for n, kw in node_kwargs.items()}
                for n, kw in (combo_nk or {}).items():
                    merged.setdefault(n, {}).update(kw)
                combo_nk = merged
            loss_i, m_i = self.codec.loss_fn(
                params, batch, jax.random.fold_in(rng, i), edge_levels=edge_levels,
                node_kwargs=combo_nk)
            prefix = combo_prefix(combo)
            for k, v in m_i.items():
                metrics[prefix + k] = v
            return loss_i, m_i, prefix

        endpoints = {}
        mids = []
        for i, combo in enumerate(combos):
            is_hi = (self.relative_flops and self.sc_axis is not None
                     and i == 0 and combo[self.sc_axis.name]
                     == len(self.sc_axis.values) - 1)
            is_lo = (self.relative_flops and self.sc_axis is not None
                     and i == len(combos) - 1 and len(combos) > 1
                     and combo[self.sc_axis.name] == 0)
            if is_hi or is_lo:
                # endpoints run first (reference runs min/max before the mid
                # combination, :940-961) and still train (sandwich rule);
                # their detached loss/FLOPs normalize the mids.
                loss_i, m_i, _ = run(i, combo)
                endpoints["hi" if is_hi else "lo"] = (
                    jax.lax.stop_gradient(loss_i),
                    jax.lax.stop_gradient(m_i.get("flops", jnp.float32(0.0))))
                total = total + loss_i
            else:
                mids.append((i, combo))

        for i, combo in mids:
            loss_i, m_i, prefix = run(i, combo)
            if self.relative_flops and "hi" in endpoints and "lo" in endpoints:
                # normalize the mid loss between the detached endpoints
                # (reference :970-978); loss_max comes from the MIN
                # complexity (worse loss), loss_min from the MAX complexity.
                loss_max, flops_min = endpoints["lo"]
                loss_min, flops_max = endpoints["hi"]
                rel_loss = (loss_i - loss_min) / jnp.maximum(
                    loss_max - loss_min, 1e-9)
                flops_i = m_i.get("flops", jnp.float32(0.0))
                rel_flops = (flops_i - flops_min) / jnp.maximum(
                    flops_max - flops_min, 1e-9)
                lam_f = 1.0
                if (self.relative_flops_lambdas is not None
                        and self.sc_axis is not None):
                    lam_f = self.relative_flops_lambdas[
                        combo[self.sc_axis.name]]
                total = total + rel_loss + lam_f * rel_flops
                metrics[prefix + "rel_loss"] = rel_loss
                metrics[prefix + "rel_flops"] = rel_flops
            else:
                extra = 0.0
                if flops_loss_mult is not None and "loss_flops" in m_i:
                    extra = (flops_loss_mult - 1.0) * m_i["loss_flops"]
                total = total + loss_i + extra

        metrics["loss"] = total
        return total, metrics


class LambdaFlopsAdjuster:
    """Host-side λC auto-adjustment state (reference :1136-1166).

    method="linear": running min/max FLOPs-per-dim; the multiplier nudges
    the FLOPs loss up when the current config overshoots its per-sclevel
    target (interpolated max→min across sclevels) and down otherwise.
    method="rejection": steps whose FLOPs-per-dim overshoot the target by
    `tolerance` get their optimizer update scaled to zero.
    """

    def __init__(self, method: str = "linear", num_levels: int = 1,
                 loss_weight: float = 1.0, tolerance: float = 0.1):
        if method not in ("linear", "rejection"):
            raise ValueError(method)
        self.method = method
        self.num_levels = max(num_levels, 1)
        self.loss_weight = loss_weight
        self.tolerance = tolerance
        self.min_fpd = float("inf")
        self.max_fpd = 0.0
        self.mult = 1.0

    def target(self, sclevel: int) -> float:
        if not np.isfinite(self.min_fpd) or self.max_fpd <= self.min_fpd:
            return self.max_fpd
        frac = sclevel / max(self.num_levels - 1, 1)
        return self.max_fpd - frac * (self.max_fpd - self.min_fpd)

    def observe(self, flops_perdim: float, sclevel: int
                ) -> Tuple[float, float]:
        """Update state; returns (flops_loss_mult, update_scale)."""
        fpd = float(flops_perdim)
        self.min_fpd = min(self.min_fpd, fpd)
        self.max_fpd = max(self.max_fpd, fpd)
        tgt = self.target(sclevel)
        span = max(self.max_fpd - self.min_fpd, 1e-9)
        # delta > 0 -> under target -> relax the FLOPs penalty
        delta = (tgt - fpd) / span
        if self.method == "linear":
            self.mult = float(np.clip(
                self.mult * (1.0 - self.loss_weight * delta), 0.1, 10.0))
            return self.mult, 1.0
        # rejection: drop the update when overshooting beyond tolerance
        reject = fpd > tgt * (1.0 + self.tolerance) and self.max_fpd > 0
        return 1.0, (0.0 if reject else 1.0)
