"""Latent-graph codec engine: a NIC model as an explicit Bayesian network.

Parity target: LatentGraphicalANSEntropyCoder (reference
cbench/modules/entropy_coder/latent_graph.py:306-1688) — nodes with
per-node entropy coders, inference edges ("{src}_{dst}" analysis-direction
modules) run in topo order, generative edges run in reverse topo order
producing each node's prior, node x handled by a zero-rate lossy coder.

TPU-first re-architecture: instead of a torch module orchestrating Python
dicts of cached tensors, the graph is a single pure flax module; the whole
training forward jits into one XLA program, and the codec wrapper jits each
edge/node stage separately for the staged encode/decode paths. Dynamic
nodes (vrlevel/sclevel selecting slimmable widths) enter as static call
arguments so each combination is its own XLA specialization.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class LatentGraphModel(nn.Module):
    """A Bayesian-network NIC model.

    Attributes:
      node_coders: {node_name: coder module} (protocol: graph/node_coders.py)
      edges: {edge_name: module}; wiring entries are (edge_name, src, dst).
      inference_wiring: edges run in order on inferred values (x -> y -> z).
      generative_wiring: edges run in reverse order on decoded values
        (z_hat -> prior(y), y_hat -> prior(x)).
      generative_order: node decode order, e.g. ("z", "y", "x").
    """

    node_coders: Dict[str, nn.Module]
    edges: Dict[str, nn.Module]
    inference_wiring: Tuple[Tuple[str, str, str], ...]
    generative_wiring: Tuple[Tuple[str, str, str], ...]
    generative_order: Tuple[str, ...] = ("z", "y", "x")
    # Static per-edge kwargs applied during training (e.g. {"x_y": {"soft":
    # True}} for PGM slimmable edges). Plain dict attr — never traced.
    train_edge_kwargs: Optional[Dict[str, Dict[str, Any]]] = None
    # FLOPs loss: loss_flops = flops_weight * max(total_flops - flops_limit, 0)
    # (parity: latent_graph.py:1102-1166 λC·clamp(F − limit)).
    flops_weight: float = 0.0
    flops_limit: float = 0.0

    def _run_edge(self, name: str, value, kw, flops_acc: list):
        out = self.edges[name](value, **kw)
        if isinstance(out, tuple):
            out, flops = out
            flops_acc.append(flops)
        return out

    def _infer_values(self, x, edge_kwargs=None, flops_acc=None) -> Dict[str, jnp.ndarray]:
        edge_kwargs = edge_kwargs or {}
        flops_acc = flops_acc if flops_acc is not None else []
        values = {self.generative_order[-1]: x}
        for edge_name, src, dst in self.inference_wiring:
            kw = edge_kwargs.get(edge_name, {})
            values[dst] = self._run_edge(edge_name, values[src], kw, flops_acc)
        return values

    def _prior_for(self, node: str, decoded: Dict[str, jnp.ndarray],
                   edge_kwargs=None, flops_acc=None) -> Optional[jnp.ndarray]:
        edge_kwargs = edge_kwargs or {}
        flops_acc = flops_acc if flops_acc is not None else []
        priors = []
        for edge_name, src, dst in self.generative_wiring:
            if dst == node and src in decoded:
                kw = edge_kwargs.get(edge_name, {})
                priors.append(self._run_edge(edge_name, decoded[src], kw, flops_acc))
        if not priors:
            return None
        out = priors[0]
        for p in priors[1:]:
            out = out + p
        return out

    def __call__(self, x, training: bool = True, rng: Optional[jax.Array] = None,
                 edge_kwargs: Optional[Dict[str, Dict[str, Any]]] = None,
                 node_kwargs: Optional[Dict[str, Dict[str, Any]]] = None):
        """Full RD forward. Returns x_hat, per-node likelihoods, loss extras.

        node_kwargs: optional per-node coder-call overrides whose values may
        be TRACED scalars (e.g. {"y": {"temperature": t}} for an annealed
        relaxation temperature, or {"x": {"lmbda": lam}} for a per-replica
        rate weight) — the functional analog of the reference's
        ParamScheduler-annealed module attributes (nn/trainer.py:756-818).
        """
        if edge_kwargs is None:
            edge_kwargs = (self.train_edge_kwargs or {}) if training else {}
        node_kwargs = node_kwargs or {}
        rngs = (dict(zip(self.node_coders,
                         jax.random.split(rng, len(self.node_coders))))
                if rng is not None else {k: None for k in self.node_coders})

        flops_acc: list = []
        values = self._infer_values(x, edge_kwargs, flops_acc)
        decoded: Dict[str, jnp.ndarray] = {}
        likelihoods: Dict[str, jnp.ndarray] = {}
        losses: Dict[str, jnp.ndarray] = {}
        metrics: Dict[str, jnp.ndarray] = {}

        for node in self.generative_order:
            prior = self._prior_for(node, decoded, edge_kwargs, flops_acc)
            out = self.node_coders[node](values[node], prior=prior,
                                         training=training, rng=rngs[node],
                                         **node_kwargs.get(node, {}))
            decoded[node] = out["value_hat"]
            if out.get("likelihood") is not None:
                likelihoods[node] = out["likelihood"]
            for k, v in out.items():
                if k.startswith("loss_"):
                    losses[k] = losses.get(k, 0.0) + v
            for k, v in out.get("metrics", {}).items():
                metrics[k] = v

        if flops_acc:
            total_flops = sum(flops_acc)  # per-image (formulas exclude batch)
            metrics["flops"] = total_flops
            if self.flops_weight > 0:
                losses["loss_flops"] = self.flops_weight * jnp.maximum(
                    total_flops - self.flops_limit, 0.0)

        x_node = self.generative_order[-1]
        return {
            "x_hat": decoded[x_node],
            "likelihoods": likelihoods,
            "losses": losses,
            "metrics": metrics,
            "latents": values,
        }

    # -- staged coding-path methods (called via model.apply(method=...)) ------
    def infer(self, x, edge_kwargs=None):
        return self._infer_values(x, edge_kwargs)

    def run_edge(self, name: str, value, **kw):
        out = self.edges[name](value, **kw)
        return out[0] if isinstance(out, tuple) else out

    def node_method(self, node: str, method, *args, **kw):
        """Invoke a coder method. `method` may be a plain name or a static
        tuple ("sub", idx, name) routing to a combined coder's sub-coder."""
        coder = self.node_coders[node]
        if isinstance(method, tuple) and method[0] == "sub":
            coder = coder.sub(method[1])
            method = method[2]
        return getattr(coder, method)(*args, **kw)

    def aux_loss(self):
        total = 0.0
        for coder in self.node_coders.values():
            if hasattr(coder, "aux_loss"):
                total = total + coder.aux_loss()
        return total


def rd_loss(output: Dict[str, Any], num_pixels: int) -> Tuple[jnp.ndarray, Dict]:
    """Assemble the RD objective from a LatentGraphModel forward output:
    sum of per-node bpp + loss_* extras (which include λ·distortion).
    Parity: latent_graph.py forward loss aggregation (:1102-1193)."""
    bpp = sum(jnp.sum(-jnp.log2(lik)) for lik in output["likelihoods"].values()
              ) / num_pixels
    loss = bpp
    metrics = {"bpp": bpp}
    for k, v in output["losses"].items():
        loss = loss + v
        metrics[k] = v
    for k, v in output["metrics"].items():
        metrics[k] = v
    if "mse" in metrics:
        metrics["psnr"] = -10.0 * jnp.log10(metrics["mse"] + 1e-12)
    metrics["loss"] = loss
    return loss, metrics


# -- fully-fused coding passes (TPU-native entropy-coding mode) --------------
# These assume the canonical 3-node wiring (x -> y -> z inference, z -> y ->
# x generative, factorized z, topogroup-AR y). LatentGraphCodec checks the
# topology before enabling the mode and falls back to the staged compat path
# otherwise.

def _tpu_pass_supported(model: "LatentGraphModel") -> bool:
    """Fused-mode support check. Learned patterns ARE supported: their
    per-image group map is computed on device from the prior (encode pass
    returns it; decode runs a small gmap pass first — see
    LatentGraphCodec._compress_tpu / _decompress_tpu)."""
    from .node_coders import FactorizedCoder
    from .topogroup import TopoGroupGaussianCoder
    try:
        order = model.generative_order
        return (len(order) == 3
                and isinstance(model.node_coders[order[0]], FactorizedCoder)
                and isinstance(model.node_coders[order[1]],
                               TopoGroupGaussianCoder))
    except Exception:
        return False


def tpu_encode_pass(model: "LatentGraphModel", x, edge_kwargs=None,
                    vrlevel=None, return_gmap: bool = False):
    """Single-dispatch encode: inference edges + z quantization + y-prior +
    the fused topogroup quantization loop. Returns packed symbol tensors for
    the host interleaved-rANS encoder.

    x may be uint8 (normalized on-device: 4x less tunnel upload).
    vrlevel: traced gain-vector rate level (topogroup.py gain vectors).
    return_gmap (learned patterns): the per-image group map is a function
    of the prior; compute it on device, use it for the fused loop, and
    return its compact channel-group form (uint8, ~H*W*CG bytes) so the
    host can order the symbol stream."""
    z_node, y_node, _ = model.generative_order
    kw = edge_kwargs or {}
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    values = model._infer_values(x, kw)
    z_coder = model.node_coders[z_node]
    y_coder = model.node_coders[y_node]
    z_sym = z_coder.symbols(values[z_node])
    z_hat = z_coder.dequantize(z_sym)
    prior = model._prior_for(y_node, {z_node: z_hat}, kw)
    gmap = None
    if return_gmap:
        gmap_cg = y_coder.topo_map_cg_from_prior(prior)
        gmap = y_coder._expand_channel_groups(gmap_cg.astype(jnp.int32))
    y_hat, y_sym, y_idx, overflow = y_coder.encode_all_groups_packed(
        values[y_node], prior, gmap, vrlevel)
    if return_gmap:
        return (z_sym.astype(jnp.int16), y_sym, y_idx, overflow,
                gmap_cg.astype(jnp.uint8))
    return (z_sym.astype(jnp.int16), y_sym, y_idx, overflow)


def tpu_encode_coded_pass(model: "LatentGraphModel", x, y_pos_segs,
                          z_tables, y_tables, z_lanes: int, y_lanes: int,
                          edge_kwargs=None, vrlevel=None):
    """Encode AND entropy-code in one dispatch: tpu_encode_pass followed by
    the on-device interleaved rans32 encoder (ops/rans_device.encode_flat32,
    byte-identical to the host C++ coder), so the host downloads
    ~compressed-size lane payloads instead of the full int16 symbol +
    uint8 index tensors — 5-7x less device->host traffic at typical rates
    (the dominant e2e cost over a remote-TPU link).

    y_pos_segs: the SAME per-group padded position segments the fused
    decoder uses (their concatenation is the y stream order).
    Returns (z_body u16, z_counts i32, z_total, y_body u16, y_counts i32,
    y_total, ok). ok=False when any symbol falls outside its table range
    (host falls back to the symbol-pull + host-coder path).
    """
    from ..ops.rans_device import encode_flat32

    z_node, y_node, _ = model.generative_order
    kw = edge_kwargs or {}
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    values = model._infer_values(x, kw)
    z_coder = model.node_coders[z_node]
    y_coder = model.node_coders[y_node]
    z_sym = z_coder.symbols(values[z_node])
    z_hat = z_coder.dequantize(z_sym)
    prior = model._prior_for(y_node, {z_node: z_hat}, kw)
    y_hat, y_sym, y_idx, _overflow = y_coder.encode_all_groups_packed(
        values[y_node], prior, None, vrlevel)

    # z lanes: raster order, per-channel distributions
    zc = z_sym.shape[-1]
    n_z = int(np.prod(z_sym.shape))
    z_idx = jnp.broadcast_to(jnp.arange(zc, dtype=jnp.int32),
                             z_sym.shape).reshape(-1)
    pad = (-n_z) % z_lanes
    z_sym_flat = jnp.pad(z_sym.reshape(-1).astype(jnp.int32), (0, pad))
    z_idx_flat = jnp.pad(z_idx, (0, pad))
    z_body, z_counts, z_total, z_ok = encode_flat32(
        z_sym_flat, z_idx_flat, n_z, z_tables, z_lanes)

    # y lanes: topogroup stream order — slice-extraction for fixed
    # patterns (canonical run order, no position gathers), else the
    # concatenated padded segments (duplicates from the padding are
    # encoded like the host path does).
    if hasattr(y_coder, "collect_stream_symbols"):
        y_sym_o, y_idx_o = y_coder.collect_stream_symbols(
            y_sym, y_idx, y_pos_segs)
        n_y = y_sym_o.shape[0]
    else:
        order = jnp.concatenate(y_pos_segs)
        y_sym_o = jnp.take(y_sym.reshape(-1).astype(jnp.int32), order)
        y_idx_o = jnp.take(y_idx.reshape(-1).astype(jnp.int32), order)
        n_y = order.shape[0]
    y_body, y_counts, y_total, y_ok = encode_flat32(
        y_sym_o, y_idx_o, n_y, y_tables, y_lanes)
    return (z_body, z_counts, z_total, y_body, y_counts, y_total,
            z_ok & y_ok)


def tpu_gmap_pass(model: "LatentGraphModel", z_lane_words, z_idx_padded,
                  n_z: int, z_shape, z_tables, edge_kwargs=None):
    """Learned-pattern decode, dispatch A: decode z, build the y prior, and
    return the compact channel-group map (uint8). The host turns it into
    per-group position segments for the fused dispatch B (which recomputes
    the same prior/argmax on device — deterministic, so encoder and decoder
    always agree)."""
    from ..ops.rans_device import decode_flat

    z_node, y_node, _ = model.generative_order
    kw = edge_kwargs or {}
    z_coder = model.node_coders[z_node]
    y_coder = model.node_coders[y_node]
    z_syms = decode_flat(z_lane_words, z_idx_padded, n_z, z_tables)
    z_hat = z_coder.dequantize(z_syms[:n_z].reshape(z_shape))
    prior = model._prior_for(y_node, {z_node: z_hat}, kw)
    return y_coder.topo_map_cg_from_prior(prior).astype(jnp.uint8)


def tpu_decode_pass(model: "LatentGraphModel", z_lane_words, z_idx_padded,
                    n_z: int, z_shape, z_tables, y_lane_words,
                    y_positions_segments, y_tables, edge_kwargs=None,
                    vrlevel=None, learned: bool = False, group_ids=None):
    """Single-dispatch decode: z interleaved-rANS decode + dequantize +
    hyper-synthesis prior + fused topogroup AR decode + synthesis.

    learned: recompute the per-image group map from the prior (same
    deterministic argmax the gmap pass / encoder used) and decode with it;
    group_ids maps position segments to group ids (empty groups skipped)."""
    from ..ops.rans_device import decode_flat

    z_node, y_node, x_node = model.generative_order
    kw = edge_kwargs or {}
    z_coder = model.node_coders[z_node]
    y_coder = model.node_coders[y_node]

    z_syms = decode_flat(z_lane_words, z_idx_padded, n_z, z_tables)
    z_sym_t = z_syms[:n_z].reshape(z_shape)
    z_hat = z_coder.dequantize(z_sym_t)
    prior = model._prior_for(y_node, {z_node: z_hat}, kw)
    gmap = y_coder.topo_map_from_prior(prior) if learned else None
    y_hat = y_coder.decode_all_groups_device(
        y_lane_words, prior, y_positions_segments, y_tables, gmap, vrlevel,
        group_ids)
    x_hat = model._prior_for(x_node, {z_node: z_hat, y_node: y_hat}, kw)
    # uint8 on-device: 4x less tunnel download than f32.
    return (jnp.clip(x_hat, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
