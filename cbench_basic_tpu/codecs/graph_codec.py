"""Codec wrapper driving a LatentGraphModel through real entropy coding.

Parity target: LatentGraphicalANSEntropyCoder encode/decode
(latent_graph.py:1232-1310): encode runs inference then the generative topo
order skipping node x, one bitstream segment per coded node, merged in
generative order; decode splits the stream and walks the generative order
feeding each node's prior from already-decoded nodes.

TPU-first split: every tensor stage (inference edges, priors, symbol
quantization, index building, dequantization, synthesis) is a separately
jitted XLA program; the host only runs the rANS coder and the byte plumbing.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.rans import (
    InterleavedRans32Encoder,
    InterleavedRansEncoder,
    Rans64Decoder,
    Rans64Encoder,
    bucket_lane_words,
    pack_lane_words,
    pack_lane_words_from_flat,
    unpack_lane_words,
)
from ..data.transforms import aligned_pad, unpad
from ..graph.latent_graph import (
    LatentGraphModel,
    _tpu_pass_supported,
    rd_loss,
    tpu_decode_pass,
    tpu_encode_coded_pass,
    tpu_encode_pass,
    tpu_gmap_pass,
)
from ..graph.node_coders import (
    FactorizedCoder,
    GaussianCoder,
    LossyDummyCoder,
    PerChannelPMFCoder,
)
from ..nn.entropy_models import export_cdf_tables
from ..utils.bytes_ops import decode_shape, encode_shape, merge_bytes, split_merged_bytes
from .base import (
    CodecInterface,
    SelfTrainableInterface,
    VariableComplexityCodecInterface,
    VariableRateCodecInterface,
)


class _RansPair:
    def __init__(self, cdfs, sizes, offsets):
        self.enc = Rans64Encoder(bypass_coding=True)
        self.dec = Rans64Decoder(bypass_coding=True)
        self.enc.init_cdf_params(cdfs, sizes, offsets)
        self.dec.init_cdf_params(cdfs, sizes, offsets)


class LatentGraphCodec(CodecInterface, SelfTrainableInterface,
                       VariableComplexityCodecInterface,
                       VariableRateCodecInterface):
    """Compress/decompress via a latent-graph model + rANS backends.

    node_specs: {node: (channels, spatial_stride)} for decode-side shape
    derivation; the x node has stride 1.
    """

    def __init__(self, model: LatentGraphModel, node_specs: Dict[str, Tuple[int, int]],
                 params: Optional[Dict] = None, alignment: int = 64,
                 lmbda: float = 0.01, trainer=None,
                 complexity_levels: Optional[list] = None,
                 coding_mode: str = "compat", num_lanes: int = 512,
                 tpu_table_margin: int = 128, lane_target: int = 512,
                 rans_bits: int = 32, device_encode: bool = True):
        self.model = model
        self.node_specs = node_specs
        self.params = params
        self.alignment = alignment
        self.lmbda = lmbda
        self.trainer = trainer
        # complexity_levels: list of {edge_name: width_level}; sclevel selects
        # one entry. Parity: _complexity_param_all_levels
        # (latent_graph.py:1614-1633); the greedy search fills this in.
        self.complexity_levels = complexity_levels
        self._complex_level = (len(complexity_levels) - 1
                               if complexity_levels else 0)
        # coding_mode: "compat" = bit-exact reference bitstream via the
        # staged host rANS path; "tpu" = single-dispatch fused passes with
        # the interleaved on-device rANS decoder (different bitstream).
        self.coding_mode = coding_mode
        self.num_lanes = num_lanes
        # single-image streams pick an adaptive power-of-two lane count
        # targeting this many symbols/lane (every lane costs 8 flush bytes);
        # batched streams always use num_lanes (throughput-bound).
        self.lane_target = lane_target
        # TPU lane-stream state width: 32 = rans32/u16-word lanes (v2 fast
        # format — pure uint32 decode steps, 4-byte flush/lane); 64 = the
        # original rANS64/u32 lanes. Decode auto-detects from the stream
        # (pack_lane_words marker), so either setting reads both.
        if rans_bits not in (32, 64):
            raise ValueError(f"rans_bits must be 32 or 64, got {rans_bits}")
        self.rans_bits = rans_bits
        # device_encode: finish batched encodes with the on-device rans32
        # coder (tpu_encode_coded_pass) so only ~compressed-size lane
        # payloads cross the link instead of full symbol/index tensors.
        # rans32 + fixed topogroup patterns only; out-of-table symbols fall
        # back to the host-coder path automatically (ok flag).
        self.device_encode = device_encode and rans_bits == 32
        self.tpu_table_margin = tpu_table_margin
        self._tpu_ok = _tpu_pass_supported(model)
        # Learned topogroup patterns: the group map is computed on device
        # from the prior per image; encode returns it compactly, decode runs
        # a small gmap pass first (see _compress_tpu / _decompress_tpu).
        self._learned_pattern = self._tpu_ok and (
            getattr(model.node_coders[model.generative_order[1]], "pattern",
                    None) == "learned")
        self._build_jitted()
        self._coders: Dict[str, _RansPair] = {}
        self._tpu_state = None
        # Per-stage coding profiler (parity: the reference's per-module
        # profiler aggregation into benchmark metrics, modules/base.py:159,
        # basic_benchmark.py:918-928). BenchmarkTestingWorker merges
        # collect_profile() into its metric rows.
        from ..utils.logging_utils import TimeProfiler
        self.profiler = TimeProfiler()

    def collect_profile(self, reset: bool = True) -> Dict[str, float]:
        """Accumulated per-stage coding seconds as profile_* metrics."""
        out = {f"profile_{k}": float(sum(v))
               for k, v in self.profiler.results.items()}
        if reset:
            self.profiler.clear()
        return out

    # -- variable rate (gain vectors, VariableRateCodecInterface) --------------
    # Parity: AutoEncoderPriorModel v2's per-vrlevel gain vectors — when the
    # y coder carries a rate axis (topogroup.py num_rate_levels > 1) this
    # codec is variable-rate within ONE parameter set; set_rate_level also
    # accepts fractional levels (continuous rate interpolation).
    @property
    def num_rate_levels(self) -> int:
        y_node = self.model.generative_order[1] if len(
            self.model.generative_order) >= 2 else None
        coder = self.model.node_coders.get(y_node) if y_node else None
        return int(getattr(coder, "num_rate_levels", 1) or 1)

    def set_rate_level(self, level, *args, **kwargs):
        self._rate_level = float(level)

    _rate_level = None

    def current_vrlevel(self):
        """Traced vrlevel scalar for coding calls; None when rate axis off."""
        if self.num_rate_levels <= 1:
            return None
        lvl = self._rate_level
        if lvl is None:
            lvl = self.num_rate_levels - 1
        return jnp.float32(lvl)

    # -- variable complexity (VariableComplexityCodecInterface) ---------------
    @property
    def num_complex_levels(self) -> int:
        return len(self.complexity_levels) if self.complexity_levels else 1

    def set_complex_level(self, level: int, *args, **kwargs):
        self._complex_level = level
        # Entries keyed "coder:<node>" select a combined coder's sub-coder
        # (the dynamic-entropy-coder axis); plain keys are edge width levels.
        if self.complexity_levels:
            cfg = self.complexity_levels[level]
            self._node_coder_choice = {
                k.split(":", 1)[1]: v for k, v in cfg.items()
                if isinstance(k, str) and k.startswith("coder:")}

    def get_current_complex_metrics(self) -> Dict[str, Any]:
        if not self.complexity_levels:
            return {}
        return {f"level_{k}": v for k, v in
                self.complexity_levels[self._complex_level].items()}

    @property
    def _edge_levels(self) -> Tuple[Tuple[str, int], ...]:
        if not self.complexity_levels:
            return ()
        return tuple(sorted(
            (k, v) for k, v in self.complexity_levels[self._complex_level].items()
            if not (isinstance(k, str) and k.startswith("coder:"))))

    # -- jit stage builders ----------------------------------------------------
    def _build_jitted(self):
        model = self.model

        @functools.partial(jax.jit, static_argnames=("edge_levels",))
        def infer_fn(p, x, edge_levels=()):
            kw = {name: {"level": l} for name, l in edge_levels}
            return model.apply({"params": p}, x, kw,
                               method=LatentGraphModel.infer)

        @functools.partial(jax.jit, static_argnames=("node", "edge_levels"))
        def prior_fn(p, node, decoded, edge_levels=()):
            kw = {name: {"level": l} for name, l in edge_levels}
            return model.apply(
                {"params": p},
                method=lambda m: m._prior_for(node, decoded, kw))

        @functools.partial(jax.jit, static_argnames=("node", "method"))
        def node_fn(p, node, method, *args):
            return model.apply(
                {"params": p},
                method=lambda m: m.node_method(node, method, *args))

        @jax.jit
        def forward_fn(p, x, rng, node_kwargs=None):
            return model.apply({"params": p}, x, training=True, rng=rng,
                               node_kwargs=node_kwargs)

        @functools.partial(jax.jit, static_argnames=("edge_levels",))
        def forward_levels_fn(p, x, rng, edge_levels, node_kwargs=None):
            kw = {name: {"level": l} for name, l in edge_levels}
            return model.apply({"params": p}, x, training=True, rng=rng,
                               edge_kwargs=kw, node_kwargs=node_kwargs)

        @jax.jit
        def eval_forward_fn(p, x):
            return model.apply({"params": p}, x, training=False)

        @functools.partial(jax.jit,
                           static_argnames=("edge_levels", "return_gmap"))
        def tpu_encode_fn(p, x, vr=None, edge_levels=(), return_gmap=False):
            kw = {name: {"level": l} for name, l in edge_levels}
            return model.apply(
                {"params": p},
                method=lambda m: tpu_encode_pass(m, x, kw, vr, return_gmap))

        @functools.partial(jax.jit, static_argnames=(
            "z_lanes", "y_lanes", "edge_levels"))
        def tpu_encode_coded_fn(p, x, y_pos_segs, z_tab, y_tab, z_lanes,
                                y_lanes, vr=None, edge_levels=()):
            kw = {name: {"level": l} for name, l in edge_levels}
            return model.apply(
                {"params": p},
                method=lambda m: tpu_encode_coded_pass(
                    m, x, y_pos_segs, z_tab, y_tab, z_lanes, y_lanes,
                    kw, vr))

        @functools.partial(jax.jit, static_argnames=(
            "n_z", "z_shape", "edge_levels", "learned", "group_ids"))
        def tpu_decode_fn(p, z_lane, z_idx_padded, n_z, z_shape, z_tab,
                          y_lane, y_pos_segs, y_tab, vr=None, edge_levels=(),
                          learned=False, group_ids=None):
            kw = {name: {"level": l} for name, l in edge_levels}
            return model.apply(
                {"params": p},
                method=lambda m: tpu_decode_pass(
                    m, z_lane, z_idx_padded, n_z, z_shape, z_tab,
                    y_lane, y_pos_segs, y_tab, kw, vr, learned, group_ids))

        @functools.partial(jax.jit, static_argnames=(
            "n_z", "z_shape", "edge_levels"))
        def tpu_gmap_fn(p, z_lane, z_idx_padded, n_z, z_shape, z_tab,
                        edge_levels=()):
            kw = {name: {"level": l} for name, l in edge_levels}
            return model.apply(
                {"params": p},
                method=lambda m: tpu_gmap_pass(
                    m, z_lane, z_idx_padded, n_z, z_shape, z_tab, kw))

        self._tpu_gmap_fn = tpu_gmap_fn
        self._tpu_encode_coded_fn = tpu_encode_coded_fn
        self._infer_fn = infer_fn
        self._prior_fn = prior_fn
        self._node_fn = node_fn
        self._tpu_encode_fn = tpu_encode_fn
        self._tpu_decode_fn = tpu_decode_fn
        self.forward_fn = forward_fn
        self.forward_levels_fn = forward_levels_fn
        self.eval_forward_fn = eval_forward_fn

    def init_params(self, rng: jax.Array, input_shape=(1, 256, 256, 3)):
        x = jnp.zeros(input_shape, jnp.float32)
        self.params = self.model.init(rng, x, training=False)["params"]
        return self.params

    # -- tables ------------------------------------------------------------------
    def update_state(self, *args, **kwargs):
        if self.params is None:
            raise ValueError("no parameters")
        tables: Dict[str, tuple] = {}
        for node, coder in self.model.node_coders.items():
            if isinstance(coder, LossyDummyCoder):
                continue
            if not hasattr(coder, "pmf_table"):
                continue
            pmf, tail, lengths, offsets = self.model.apply(
                {"params": self.params},
                method=lambda m: m.node_method(node, "pmf_table"))
            cdfs, sizes, offs = export_cdf_tables(
                np.asarray(pmf), np.asarray(tail),
                np.asarray(lengths), np.asarray(offsets))
            self._coders[node] = _RansPair(cdfs, sizes, offs)
            tables[node] = (cdfs, sizes, offs)

        if self._tpu_ok:
            from ..ops.rans_device import build_decoder_tables
            self._tpu_state = {"_segments": {}}
            for node, coder in self.model.node_coders.items():
                if node not in tables:
                    continue
                # Re-export with a ±margin range extension: the interleaved
                # mode has no bypass escape, so widen tables instead (each
                # extra slot costs one 2^-16 count of probability mass).
                pmf, tail_, lengths, offsets = self.model.apply(
                    {"params": self.params},
                    method=lambda m, node=node: m.node_method(node, "pmf_table"))
                cdfs, sizes, offs = export_cdf_tables(
                    np.asarray(pmf), np.asarray(tail_), np.asarray(lengths),
                    np.asarray(offsets), margin=self.tpu_table_margin)
                enc = (InterleavedRans32Encoder() if self.rans_bits == 32
                       else InterleavedRansEncoder())
                enc.init_cdf_params(cdfs, sizes, offs)
                self._tpu_state[node] = {
                    "enc": enc,
                    "tables": build_decoder_tables(cdfs, sizes, offs),
                }

    def invalidate_coders(self):
        self._coders = {}

    def _ensure_ready(self):
        if not self._coders:
            self.update_state()

    # -- compress -------------------------------------------------------------------
    def _prep_image(self, data):
        img = np.asarray(data)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        padded, size = aligned_pad(img, self.alignment)
        return padded[None], size

    def _encode_node(self, node, value, prior) -> Tuple[bytes, jnp.ndarray]:
        coder_mod = self.model.node_coders[node]
        pair = self._coders.get(node)
        # Coders with custom host loops (topogroup AR, autoregressive
        # categorical) take precedence over the generic protocols.
        if getattr(coder_mod, "host_encode", None) is not None:
            return coder_mod.host_encode(self, node, value, prior, pair)
        if isinstance(coder_mod, PerChannelPMFCoder):
            symbols = np.asarray(self._node_fn(self.params, node, "symbols", value))
            c = symbols.shape[-1]
            idx = np.broadcast_to(np.arange(c, dtype=np.int32), symbols.shape)
            stream = pair.enc.encode_with_indexes(symbols, idx)
            decoded = self._node_fn(self.params, node, "dequantize",
                                    jnp.asarray(symbols))
            return stream, decoded
        if hasattr(coder_mod, "coding_params"):
            # GaussianCoder-protocol conditional coders (incl. the
            # distribution-grid family, graph/dist_coders.py): prior ->
            # per-element table indexes (+ integer offsets).
            indexes, _ = self._node_fn(self.params, node, "coding_params", prior)
            symbols = np.asarray(self._node_fn(self.params, node, "symbols",
                                               value, prior))
            stream = pair.enc.encode_with_indexes(symbols, np.asarray(indexes))
            decoded = self._node_fn(self.params, node, "dequantize",
                                    jnp.asarray(symbols), prior)
            return stream, decoded
        raise TypeError(f"no encode backend for node {node}: {type(coder_mod)}")

    def _decode_node(self, node, stream: bytes, prior, shape) -> jnp.ndarray:
        coder_mod = self.model.node_coders[node]
        pair = self._coders.get(node)
        if getattr(coder_mod, "host_decode", None) is not None:
            return coder_mod.host_decode(self, node, stream, prior, shape, pair)
        if isinstance(coder_mod, PerChannelPMFCoder):
            c = shape[-1]
            idx = np.broadcast_to(np.arange(c, dtype=np.int32), shape)
            symbols = pair.dec.decode_with_indexes(stream, idx)
            return self._node_fn(self.params, node, "dequantize", jnp.asarray(symbols))
        if hasattr(coder_mod, "coding_params"):
            indexes, _ = self._node_fn(self.params, node, "coding_params", prior)
            symbols = pair.dec.decode_with_indexes(stream, np.asarray(indexes))
            return self._node_fn(self.params, node, "dequantize",
                                 jnp.asarray(symbols), prior)
        raise TypeError(f"no decode backend for node {node}: {type(coder_mod)}")

    MODE_COMPAT = 0
    MODE_TPU = 1
    MODE_TPU_BATCH = 2

    # -- batched multi-image coding (throughput mode) --------------------------
    # All images of one call share the XLA dispatches: one fused encode pass
    # and one fused decode pass for the WHOLE batch — batch-N convs use the
    # MXU far better than N batch-1 convs, and the per-dispatch latency
    # amortizes N-fold. Images must share a shape; mixed shapes fall back to
    # per-image streams inside the same container.
    def compress_batch(self, images) -> bytes:
        images = list(images)
        if len(images) > 0xFFFF:
            raise ValueError(
                f"compress_batch supports at most 65535 images per container "
                f"(got {len(images)}); chunk the batch")
        shapes = {np.asarray(im).shape for im in images}
        # Header: 1-byte mode + uint16 big-endian image count.
        if (self.coding_mode == "tpu" and self._tpu_ok and len(shapes) == 1
                and len(images) > 1):
            out = self._compress_tpu_batch(images)
            if out is not None:
                return (bytes([self.MODE_TPU_BATCH])
                        + len(images).to_bytes(2, "big") + out)
        streams = [self.compress(im) for im in images]
        return (bytes([self.MODE_COMPAT]) + len(images).to_bytes(2, "big")
                + merge_bytes(streams, num_segments=len(streams)))

    def decompress_batch(self, data: bytes):
        mode = data[0]
        count = int.from_bytes(data[1:3], "big")
        if mode == self.MODE_TPU_BATCH:
            return self._decompress_tpu_batch(data[3:], count)
        streams = split_merged_bytes(data[3:], num_segments=count)
        return [self.decompress(s) for s in streams]

    def _y_segments_batched(self, y_shape, lanes: int):
        """Per-group positions covering the whole batch: the single-image
        group masks offset by n*H*W*C per image, padded per group."""
        cache = self._tpu_state.setdefault("_segments_b", {})
        key = (y_shape, lanes)
        if key in cache:
            return cache[key]
        from ..ops.rans_device import pad_positions
        n = y_shape[0]
        per_image = int(np.prod(y_shape[1:]))
        y_node = self.model.generative_order[1]
        coder = self.model.node_coders[y_node]
        # Slice-canonical order when the pattern decomposes into 2x2
        # product runs (the slice-layout coding path); raster-mask order
        # otherwise. Both producers of a tpu-mode stream (device rans32
        # encoder, host C++ fallback) take this as the order source.
        masks = None
        if hasattr(coder, "canonical_group_positions"):
            masks = coder.canonical_group_positions((1,) + y_shape[1:])
        if masks is None:
            masks = coder.host_group_masks((1,) + y_shape[1:])
        segs, orders = [], []
        for m in masks:
            if not m.size:
                continue
            batched = np.concatenate([m + i * per_image for i in range(n)])
            padded = pad_positions(batched, lanes)
            segs.append(jnp.asarray(padded))
            orders.append(padded)
        order = np.concatenate(orders)
        cache[key] = (tuple(segs), order)
        return cache[key]

    def _paged_prefix(self, arr, total: int, page: int = 1 << 16) -> np.ndarray:
        """Download the first `total` elements of a device array, slicing
        on DEVICE in page-quantized lengths so the slice-program cache
        stays a handful of shapes instead of one per distinct total."""
        words = min(int(arr.shape[0]), -(-total // page) * page)
        return np.asarray(arr[:words])[:total]

    def _compress_tpu_batch_device(self, x, h, w) -> Optional[bytes]:
        """Fully-fused batched encode: NN + quantization + interleaved
        rans32 in ONE dispatch (tpu_encode_coded_pass), host downloads only
        lane counts + the ~compressed-size stream payloads. Returns None
        when a symbol exceeds its table range (host-coder fallback) —
        the produced stream is byte-identical to the host path's either way."""
        z_node, y_node, _ = self.model.generative_order
        yc, ys = self.node_specs[y_node]
        y_shape = (x.shape[0], x.shape[1] // ys, x.shape[2] // ys, yc)
        segs, _ = self._y_segments_batched(y_shape, self.num_lanes)
        with self.profiler.profile("encode_device_pass"):
            (z_body, z_counts, z_total, y_body, y_counts, y_total,
             ok) = self._tpu_encode_coded_fn(
                self.params, jnp.asarray(x), segs,
                self._tpu_state[z_node]["tables"],
                self._tpu_state[y_node]["tables"],
                z_lanes=self.num_lanes, y_lanes=self.num_lanes,
                vr=self.current_vrlevel(), edge_levels=self._edge_levels)
            z_counts, y_counts, z_total, y_total, ok = jax.device_get(
                (z_counts, y_counts, z_total, y_total, ok))
        if not bool(ok):
            return None
        with self.profiler.profile("encode_stream_pull"):
            z_pack = pack_lane_words_from_flat(
                z_counts, self._paged_prefix(z_body, int(z_total)))
            y_pack = pack_lane_words_from_flat(
                y_counts, self._paged_prefix(y_body, int(y_total)))
        header = encode_shape((h, w))
        return header + merge_bytes([z_pack, y_pack], num_segments=2)

    def _compress_tpu_batch(self, images) -> Optional[bytes]:
        self._ensure_ready()
        prepped = [self._prep_image_u8(im) for im in images]
        (h, w) = prepped[0][1]
        x = np.concatenate([p[0] for p in prepped], axis=0)
        if self.device_encode and not self._learned_pattern:
            try:
                stream = self._compress_tpu_batch_device(x, h, w)
            except ValueError:  # lane-count overflow: host path raises too
                stream = None
            if stream is not None:
                return stream
        z_node, y_node, _ = self.model.generative_order
        with self.profiler.profile("encode_device_pass"):
            enc_out = jax.tree_util.tree_map(
                np.asarray, self._tpu_encode_fn(
                    self.params, jnp.asarray(x), self.current_vrlevel(),
                    edge_levels=self._edge_levels,
                    return_gmap=self._learned_pattern))
        gmap_cg = None
        if self._learned_pattern:
            z_sym, y_sym, y_idx, overflow, gmap_cg = enc_out
        else:
            z_sym, y_sym, y_idx, overflow = enc_out
        if bool(overflow):
            return None
        z_sym = np.asarray(z_sym, np.int32)
        y_sym = np.asarray(y_sym, np.int32).reshape(-1)
        y_idx = np.asarray(y_idx, np.int32).reshape(-1)
        zc = z_sym.shape[-1]
        z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                z_sym.shape).reshape(-1)
        yc, ys = self.node_specs[y_node]
        if self._learned_pattern:
            # gmap positions are global over the whole batch buffer, which
            # is exactly the flat coordinate space the fused decode uses.
            _, _, order = self._y_segments_learned(gmap_cg, self.num_lanes)
        else:
            _, order = self._y_segments_batched(
                (x.shape[0], x.shape[1] // ys, x.shape[2] // ys, yc),
                self.num_lanes)
        try:
            with self.profiler.profile("encode_host_rans"):
                z_words, z_counts = self._tpu_state[z_node]["enc"].encode(
                    z_sym.reshape(-1), z_idx, self.num_lanes)
                y_words, y_counts = self._tpu_state[y_node]["enc"].encode(
                    y_sym[order], y_idx[order], self.num_lanes)
        except ValueError:
            return None
        header = encode_shape((h, w))
        return header + merge_bytes(
            [pack_lane_words(z_words, z_counts),
             pack_lane_words(y_words, y_counts)], num_segments=2)

    def _decode_batch_args(self, data: bytes, count: int):
        """Host prep for the fused batched decode: returns ((h, w), args)
        where args feed _tpu_decode_fn directly (word arrays still host-side;
        callers jnp.asarray them so the transfer is attributable)."""
        self._ensure_ready()
        (h, w), hdr = decode_shape(data)
        z_pack, y_pack = split_merged_bytes(data[hdr:], num_segments=2)
        ph = -(-h // self.alignment) * self.alignment
        pw = -(-w // self.alignment) * self.alignment
        z_node, y_node, _ = self.model.generative_order
        zc, zs = self.node_specs[z_node]
        yc, ys = self.node_specs[y_node]
        z_shape = (count, ph // zs, pw // zs, zc)
        y_shape = (count, ph // ys, pw // ys, yc)

        with self.profiler.profile("decode_host_unpack"):
            z_words, _ = unpack_lane_words(z_pack)
            y_words, _ = unpack_lane_words(y_pack)
            z_words = bucket_lane_words(z_words)
            y_words = bucket_lane_words(y_words)

        n_z = int(np.prod(z_shape))
        zcache = self._tpu_state.setdefault("_zidx", {})
        zkey = (z_shape, z_words.shape[0])
        if zkey not in zcache:
            pad = (-n_z) % z_words.shape[0]
            z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                    z_shape).reshape(-1)
            zcache[zkey] = jnp.asarray(
                np.concatenate([z_idx, np.zeros(pad, np.int32)]))
        z_idx_padded = zcache[zkey]
        z_node_tables = self._tpu_state[z_node]["tables"]
        y_node_tables = self._tpu_state[y_node]["tables"]
        group_ids = None
        if self._learned_pattern:
            with self.profiler.profile("decode_gmap_pass"):
                gmap_cg = np.asarray(self._tpu_gmap_fn(
                    self.params, jnp.asarray(z_words), z_idx_padded, n_z,
                    z_shape, z_node_tables, edge_levels=self._edge_levels))
            segs, group_ids, _ = self._y_segments_learned(
                gmap_cg, y_words.shape[0])
        else:
            segs, _ = self._y_segments_batched(y_shape, y_words.shape[0])
        return (h, w), (z_words, z_idx_padded, n_z, z_shape, z_node_tables,
                        y_words, segs, y_node_tables, group_ids)

    def _decompress_tpu_batch(self, data: bytes, count: int):
        (h, w), (z_words, z_idx_padded, n_z, z_shape, z_tabs,
                 y_words, segs, y_tabs, group_ids) = self._decode_batch_args(
                     data, count)
        with self.profiler.profile("decode_device_pass"):
            x_hat = self._tpu_decode_fn(
                self.params, jnp.asarray(z_words), z_idx_padded,
                n_z, z_shape, z_tabs,
                jnp.asarray(y_words), segs, y_tabs,
                self.current_vrlevel(), edge_levels=self._edge_levels,
                learned=self._learned_pattern, group_ids=group_ids)
            imgs = np.asarray(x_hat)
        return [unpad(imgs[i], (h, w)) for i in range(count)]

    # -- device-only timing probes (bench.py `detail` block) -------------------
    # The decode_device_pass profiler stage wall-times the whole block, which
    # over the dev tunnel is dominated by the stream upload + image download
    # (docs/performance.md transfer-floor analysis). These probes time the
    # fused XLA programs with inputs already device-resident and outputs NOT
    # downloaded: compute + one dispatch latency, no payload transfers.
    def time_device_decode_batch(self, data: bytes, iters: int = 3) -> float:
        import time as _time
        count = int.from_bytes(data[1:3], "big")
        assert data[0] == self.MODE_TPU_BATCH, "need a tpu-batch stream"
        _, (z_words, z_idx_padded, n_z, z_shape, z_tabs,
            y_words, segs, y_tabs, group_ids) = self._decode_batch_args(
                data[3:], count)
        z_dev = jax.block_until_ready(jnp.asarray(z_words))
        y_dev = jax.block_until_ready(jnp.asarray(y_words))
        times = []
        for _ in range(iters):
            t0 = _time.perf_counter()
            out = self._tpu_decode_fn(
                self.params, z_dev, z_idx_padded, n_z, z_shape, z_tabs,
                y_dev, segs, y_tabs, self.current_vrlevel(),
                edge_levels=self._edge_levels,
                learned=self._learned_pattern, group_ids=group_ids)
            jax.block_until_ready(out)
            times.append(_time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    def time_device_encode_batch(self, images, iters: int = 3) -> float:
        """Times whichever fused encode program the e2e path actually
        runs: the coded (NN + on-device rans32) dispatch when
        device_encode is active, else the symbol-producing dispatch."""
        import time as _time
        self._ensure_ready()
        x = np.concatenate(
            [self._prep_image_u8(im)[0] for im in images], axis=0)
        x_dev = jax.block_until_ready(jnp.asarray(x))
        use_coded = self.device_encode and not self._learned_pattern
        if use_coded:
            z_node, y_node, _ = self.model.generative_order
            yc, ys = self.node_specs[y_node]
            y_shape = (x.shape[0], x.shape[1] // ys, x.shape[2] // ys, yc)
            segs, _ = self._y_segments_batched(y_shape, self.num_lanes)
            z_tab = self._tpu_state[z_node]["tables"]
            y_tab = self._tpu_state[y_node]["tables"]
        times = []
        for _ in range(iters):
            t0 = _time.perf_counter()
            if use_coded:
                out = self._tpu_encode_coded_fn(
                    self.params, x_dev, segs, z_tab, y_tab,
                    z_lanes=self.num_lanes, y_lanes=self.num_lanes,
                    vr=self.current_vrlevel(),
                    edge_levels=self._edge_levels)
            else:
                out = self._tpu_encode_fn(self.params, x_dev,
                                          self.current_vrlevel(),
                                          edge_levels=self._edge_levels,
                                          return_gmap=self._learned_pattern)
            jax.block_until_ready(out)
            times.append(_time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    def compress(self, data) -> bytes:
        if self.coding_mode == "tpu" and self._tpu_ok:
            out = self._compress_tpu(data)
            if out is not None:
                return bytes([self.MODE_TPU]) + out
        return bytes([self.MODE_COMPAT]) + self._compress_compat(data)

    def decompress(self, data: bytes):
        mode = data[0]
        if mode == self.MODE_TPU:
            return self._decompress_tpu(data[1:])
        return self._decompress_compat(data[1:])

    # -- TPU-native fused coding mode ------------------------------------------
    def _adaptive_lanes(self, n_symbols: int) -> int:
        """Lane count for SINGLE-image streams: every lane costs 8 bytes of
        rANS flush plus up-to-a-lane of group padding, so small images want
        far fewer than the batched default. Power of two targeting
        ~lane_target symbols/lane, clamped to [128, num_lanes]."""
        lanes = min(128, self.num_lanes)
        while lanes < self.num_lanes and n_symbols > lanes * self.lane_target:
            lanes *= 2
        return min(lanes, self.num_lanes)

    def _y_segments(self, y_shape, lanes: int):
        """Per-group flat positions padded by repetition (static per shape/
        pattern), plus the concatenated padded order for the encoder.
        Cached per (shape, lane count) — fixed patterns are
        shape-deterministic."""
        cache = self._tpu_state.setdefault("_segments", {})
        key = (y_shape, lanes)
        if key in cache:
            return cache[key]
        from ..ops.rans_device import pad_positions
        y_node = self.model.generative_order[1]
        coder = self.model.node_coders[y_node]
        masks = None
        if hasattr(coder, "canonical_group_positions"):
            masks = coder.canonical_group_positions(y_shape)
        if masks is None:
            masks = coder.host_group_masks(y_shape)
        segs = tuple(jnp.asarray(pad_positions(m, lanes))
                     for m in masks if m.size)
        order = np.concatenate([pad_positions(m, lanes)
                                for m in masks if m.size])
        cache[key] = (segs, order)
        return segs, order

    def _prep_image_u8(self, data):
        img = np.asarray(data)
        if img.dtype != np.uint8:
            img = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
        padded, size = aligned_pad(img, self.alignment)
        return padded[None], size

    def _y_segments_learned(self, gmap_cg, lanes: int):
        """Segments/order from a device-computed (learned-pattern) group
        map: (segs, group_ids, order). Content-dependent — no shape cache;
        empty groups are skipped but their ids kept so decode's group_step
        runs with the encoder's group numbering."""
        from ..ops.rans_device import pad_positions
        y_node = self.model.generative_order[1]
        coder = self.model.node_coders[y_node]
        gmap = coder.host_expand_channel_groups(np.asarray(gmap_cg))
        masks = coder.host_group_masks(None, gmap)
        segs, ids, orders = [], [], []
        for g, m in enumerate(masks):
            if not m.size:
                continue
            p = pad_positions(m, lanes)
            segs.append(jnp.asarray(p))
            ids.append(g)
            orders.append(p)
        return tuple(segs), tuple(ids), np.concatenate(orders)

    def _compress_tpu_single_device(self, x, h, w) -> Optional[bytes]:
        """Single-image fully-fused encode (see _compress_tpu_batch_device),
        with the single-image path's adaptive per-stream lane counts."""
        z_node, y_node, _ = self.model.generative_order
        zc, zs = self.node_specs[z_node]
        yc, ys = self.node_specs[y_node]
        y_shape = (1, x.shape[1] // ys, x.shape[2] // ys, yc)
        n_z = x.shape[1] // zs * (x.shape[2] // zs) * zc
        lanes_z = self._adaptive_lanes(n_z)
        lanes_y = self._adaptive_lanes(int(np.prod(y_shape)))
        segs, _ = self._y_segments(y_shape, lanes_y)
        with self.profiler.profile("encode_device_pass"):
            (z_body, z_counts, z_total, y_body, y_counts, y_total,
             ok) = self._tpu_encode_coded_fn(
                self.params, jnp.asarray(x), segs,
                self._tpu_state[z_node]["tables"],
                self._tpu_state[y_node]["tables"],
                z_lanes=lanes_z, y_lanes=lanes_y,
                vr=self.current_vrlevel(), edge_levels=self._edge_levels)
            z_counts, y_counts, z_total, y_total, ok = jax.device_get(
                (z_counts, y_counts, z_total, y_total, ok))
        if not bool(ok):
            return None
        with self.profiler.profile("encode_stream_pull"):
            z_pack = pack_lane_words_from_flat(
                z_counts, self._paged_prefix(z_body, int(z_total)))
            y_pack = pack_lane_words_from_flat(
                y_counts, self._paged_prefix(y_body, int(y_total)))
        header = encode_shape((h, w))
        return header + merge_bytes([z_pack, y_pack], num_segments=2)

    def _compress_tpu(self, data) -> Optional[bytes]:
        self._ensure_ready()
        x, (h, w) = self._prep_image_u8(data)
        if self.device_encode and not self._learned_pattern:
            try:
                stream = self._compress_tpu_single_device(x, h, w)
            except ValueError:
                stream = None
            if stream is not None:
                return stream
        z_node, y_node, _ = self.model.generative_order
        with self.profiler.profile("encode_device_pass"):
            enc_out = jax.tree_util.tree_map(
                np.asarray, self._tpu_encode_fn(
                    self.params, x, self.current_vrlevel(),
                    edge_levels=self._edge_levels,
                    return_gmap=self._learned_pattern))
        gmap_cg = None
        if self._learned_pattern:
            z_sym, y_sym, y_idx, overflow, gmap_cg = enc_out
        else:
            z_sym, y_sym, y_idx, overflow = enc_out
        z_sym = np.asarray(z_sym, np.int32)
        y_sym = np.asarray(y_sym, np.int32).reshape(-1)
        y_idx = np.asarray(y_idx, np.int32).reshape(-1)

        zc = z_sym.shape[-1]
        z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                z_sym.shape).reshape(-1)
        yc, ys = self.node_specs[y_node]
        lanes_z = self._adaptive_lanes(z_idx.size)
        lanes_y = self._adaptive_lanes(y_sym.size)
        if self._learned_pattern:
            _, _, order = self._y_segments_learned(gmap_cg, lanes_y)
        else:
            _, order = self._y_segments(
                (x.shape[0], x.shape[1] // ys, x.shape[2] // ys, yc), lanes_y)
        try:
            with self.profiler.profile("encode_host_rans"):
                z_words, z_counts = self._tpu_state[z_node]["enc"].encode(
                    z_sym.reshape(-1), z_idx, lanes_z)
                y_words, y_counts = self._tpu_state[y_node]["enc"].encode(
                    y_sym[order], y_idx[order], lanes_y)
        except ValueError:
            return None  # out-of-range symbols: caller falls back to compat
        if bool(overflow):
            return None
        header = encode_shape((h, w))
        return header + merge_bytes(
            [pack_lane_words(z_words, z_counts),
             pack_lane_words(y_words, y_counts)], num_segments=2)

    def _decompress_tpu(self, data: bytes):
        self._ensure_ready()
        (h, w), hdr = decode_shape(data)
        z_pack, y_pack = split_merged_bytes(data[hdr:], num_segments=2)
        ph = -(-h // self.alignment) * self.alignment
        pw = -(-w // self.alignment) * self.alignment
        z_node, y_node, _ = self.model.generative_order
        zc, zs = self.node_specs[z_node]
        yc, ys = self.node_specs[y_node]
        z_shape = (1, ph // zs, pw // zs, zc)
        y_shape = (1, ph // ys, pw // ys, yc)

        with self.profiler.profile("decode_host_unpack"):
            z_words, _ = unpack_lane_words(z_pack)
            y_words, _ = unpack_lane_words(y_pack)
            z_words = bucket_lane_words(z_words)
            y_words = bucket_lane_words(y_words)

        # lane counts ride in the stream headers (adaptive per image size)
        n_z = int(np.prod(z_shape))
        zcache = self._tpu_state.setdefault("_zidx", {})
        zkey = (z_shape, z_words.shape[0])
        if zkey not in zcache:
            pad = (-n_z) % z_words.shape[0]
            z_idx = np.broadcast_to(np.arange(zc, dtype=np.int32),
                                    z_shape).reshape(-1)
            zcache[zkey] = jnp.asarray(
                np.concatenate([z_idx, np.zeros(pad, np.int32)]))
        z_idx_padded = zcache[zkey]
        z_dev = jnp.asarray(z_words)
        group_ids = None
        if self._learned_pattern:
            with self.profiler.profile("decode_gmap_pass"):
                gmap_cg = np.asarray(self._tpu_gmap_fn(
                    self.params, z_dev, z_idx_padded, n_z, z_shape,
                    self._tpu_state[z_node]["tables"],
                    edge_levels=self._edge_levels))
            segs, group_ids, _ = self._y_segments_learned(
                gmap_cg, y_words.shape[0])
        else:
            segs, _ = self._y_segments(y_shape, y_words.shape[0])

        with self.profiler.profile("decode_device_pass"):
            x_hat = self._tpu_decode_fn(
                self.params, z_dev, z_idx_padded,
                n_z, z_shape, self._tpu_state[z_node]["tables"],
                jnp.asarray(y_words), segs, self._tpu_state[y_node]["tables"],
                self.current_vrlevel(), edge_levels=self._edge_levels,
                learned=self._learned_pattern, group_ids=group_ids)
            img = np.asarray(x_hat[0])  # already uint8 (converted on-device)
        return unpad(img, (h, w))

    # -- compat (bit-exact reference bitstream) mode -----------------------------
    def _compress_compat(self, data) -> bytes:
        self._ensure_ready()
        x, (h, w) = self._prep_image(data)
        with self.profiler.profile("encode_infer"):
            values = self._infer_fn(self.params, x,
                                    edge_levels=self._edge_levels)
        decoded: Dict[str, jnp.ndarray] = {}
        streams = []
        for node in self.model.generative_order[:-1]:  # node x is not coded
            with self.profiler.profile(f"encode_node_{node}"):
                prior = self._prior_fn(self.params, node, decoded,
                                       edge_levels=self._edge_levels)
                stream, node_hat = self._encode_node(node, values[node], prior)
            decoded[node] = node_hat
            streams.append(stream)
        header = encode_shape((h, w))
        return header + merge_bytes(streams, num_segments=len(streams))

    def _decompress_compat(self, data: bytes):
        self._ensure_ready()
        (h, w), hdr = decode_shape(data)
        ph = -(-h // self.alignment) * self.alignment
        pw = -(-w // self.alignment) * self.alignment
        n_coded = len(self.model.generative_order) - 1
        streams = split_merged_bytes(data[hdr:], num_segments=n_coded)

        decoded: Dict[str, jnp.ndarray] = {}
        x_node = self.model.generative_order[-1]
        x_hat = None
        for i, node in enumerate(self.model.generative_order):
            with self.profiler.profile(f"decode_node_{node}"):
                prior = self._prior_fn(self.params, node, decoded,
                                       edge_levels=self._edge_levels)
                if node == x_node:
                    x_hat = jnp.clip(prior, 0.0, 1.0)
                    break
                c, stride = self.node_specs[node]
                shape = (1, ph // stride, pw // stride, c)
                decoded[node] = self._decode_node(node, streams[i], prior,
                                                  shape)

        img = np.asarray(x_hat[0])
        img = unpad(img, (h, w))
        return (img * 255.0 + 0.5).astype(np.uint8)

    # -- training glue ------------------------------------------------------------
    def loss_fn(self, params, x, rng, edge_levels=None, node_kwargs=None):
        """RD loss. edge_levels=None -> the model's training default (soft
        pgm mixtures); otherwise a static hard-width configuration — the
        sampled-width ("sandwich") training mode that makes every slimmable
        level usable standalone (parity: per-step dynamic-node sampling,
        latent_graph.py:898-961 / pgm_layers sandwich rule).
        node_kwargs: traced per-node coder overrides (scheduled scalars)."""
        if edge_levels:
            out = self.forward_levels_fn(params, x, rng, edge_levels,
                                         node_kwargs)
        else:
            out = self.forward_fn(params, x, rng, node_kwargs)
        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        return rd_loss(out, num_pixels)

    def eval_loss_fn(self, params, x):
        """Validation objective: eval-mode (hard-quantized, hard-width)
        forward + RD loss — the val_metric source for best-checkpointing
        (parity: _LightningBasicModelWrapper.validation_step val_metric,
        nn/trainer.py:1142-1201)."""
        out = self.eval_forward_fn(params, x)
        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        return rd_loss(out, num_pixels)

    def training_level_choices(self):
        """Per-step width-sampling menu for the trainer: None (soft
        mixture) plus each uniform hard level."""
        if not self.complexity_levels:
            return [None]
        return [None] + [self._edge_levels_for(i)
                         for i in range(len(self.complexity_levels))]

    def _edge_levels_for(self, level: int):
        return tuple(sorted(
            (k, v) for k, v in self.complexity_levels[level].items()
            if not (isinstance(k, str) and k.startswith("coder:"))))

    # -- entropy-only evaluation ---------------------------------------------------
    def forward_estimate_bitlen(self, data):
        """NN-forward-only bitlength estimate (no entropy coding) — parity:
        NNTrainableCodec.forward_estimate_bitlen (codecs/base.py:91-135) and
        the benchmark's nn_bitlen_estimation mode. Returns estimated total
        bits from eval likelihoods."""
        x, _ = self._prep_image(data)
        out = self.eval_forward_fn(self.params, x)
        import jax.numpy as jnp
        bits = sum(float(jnp.sum(-jnp.log2(l)))
                   for l in out["likelihoods"].values())
        return bits
