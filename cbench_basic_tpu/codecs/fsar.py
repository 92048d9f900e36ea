"""FSAR — finite-state autoregressive entropy coder for categorical data.

Parity target: AutoregressiveEntropyCoder (reference
cbench/modules/entropy_coder/autoregressive.py:37-845): a trainable
categorical model whose per-symbol distribution depends on previously coded
neighbor symbols through a finite-state function — a dense lookup table
("table") or an MLP over neighbor one-hots ("mlp") — exported at
update_state into native in-loop AR tables so the state transition happens
INSIDE the C coding loop (zero per-symbol host round-trips).

Beyond the reference: the reference only wires FSAR through tANS ("rans
fsar is not implemented!", autoregressive.py:82-86); here both backends
support in-loop AR, and rANS is the default.

TPU-first: the training forward is one fused XLA program — neighbor
symbols are gathered with padded shifts, the table/MLP is evaluated for all
elements at once, and the loss is a batched cross-entropy on the MXU.
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..coding.ar_utils import create_ar_offsets
from ..coding.rans import Rans64Decoder, Rans64Encoder
from ..nn.entropy_models import export_cdf_tables
from ..utils.bytes_ops import decode_shape, encode_shape
from .base import CodecInterface


class FSARModel(nn.Module):
    """Trainable finite-state AR categorical model.

    Data layout: (N, S, C) integer symbols in [0, K); the AR window is
    ``ar_offsets`` — per-neighbor (spatial, channel) non-positive offsets,
    order <= 2 (the native coder's in-loop table limit; the reference keeps
    the same bound, autoregressive.py:777-780). State index 0 means
    "neighbor out of bounds".
    """

    channel_dim: int = 1          # C
    categorical_dim: int = 256    # K
    ar_method: str = "table"      # "none" | "table" | "mlp"
    ar_offsets: Tuple[Tuple[int, int], ...] = ((-1, 0),)
    mlp_hidden: int = 64

    @property
    def window(self) -> int:
        return len(self.ar_offsets)

    @property
    def num_states(self) -> int:
        return self.categorical_dim + 1  # +1 = out-of-bounds marker

    def setup(self):
        C, K = self.channel_dim, self.categorical_dim
        if self.ar_method == "none":
            self.prior_logits = self.param(
                "prior_logits", nn.initializers.zeros, (C, K))
        elif self.ar_method == "table":
            if self.window > 2:
                raise ValueError("native in-loop AR supports order <= 2")
            shape = (C,) + (self.num_states,) * self.window + (K,)
            self.ar_table_logits = self.param(
                "ar_table_logits", nn.initializers.zeros, shape)
        elif self.ar_method == "mlp":
            if self.window > 2:
                raise ValueError("native in-loop AR supports order <= 2")
            self.prior_logits = self.param(
                "prior_logits", nn.initializers.zeros, (C, K))
            self.fsar_mlp = nn.Sequential([
                nn.Dense(self.mlp_hidden), nn.leaky_relu,
                nn.Dense(self.mlp_hidden), nn.leaky_relu,
                nn.Dense(K),
            ])
        else:
            raise ValueError(f"unknown ar_method {self.ar_method!r}")

    # -- neighbor gathering ------------------------------------------------------
    def _neighbor_states(self, symbols: jnp.ndarray) -> List[jnp.ndarray]:
        """Per-offset neighbor state index (symbol+1, 0 out of bounds),
        each (N, S, C) int32."""
        out = []
        for ds, dc in self.ar_offsets:
            x = symbols + 1
            if ds < 0:
                pad = jnp.zeros_like(x[:, :(-ds)])
                x = jnp.concatenate([pad, x[:, :ds]], axis=1)
            if dc < 0:
                pad = jnp.zeros_like(x[..., :(-dc)])
                x = jnp.concatenate([pad, x[..., :dc]], axis=-1)
            out.append(x)
        return out

    def _state_logits_mlp(self, states: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """MLP over neighbor one-hots (+ channel one-hot): (N, S, C, K)."""
        n, s, c = states[0].shape
        feats = [jax.nn.one_hot(st, self.num_states) for st in states]
        chan = jnp.broadcast_to(
            jnp.eye(self.channel_dim)[None, None], (n, s, c, c))
        inp = jnp.concatenate(feats + [chan], axis=-1)
        return self.fsar_mlp(inp) + self.prior_logits[None, None]

    def logits_for(self, symbols: jnp.ndarray) -> jnp.ndarray:
        """Per-element categorical logits (N, S, C, K) under the AR model."""
        if self.ar_method == "none":
            n, s, c = symbols.shape
            return jnp.broadcast_to(self.prior_logits[None, None],
                                    (n, s, c, self.categorical_dim))
        states = self._neighbor_states(symbols)
        if self.ar_method == "mlp":
            return self._state_logits_mlp(states)
        # table: gather rows per (channel, state...)
        tab = self.ar_table_logits                      # (C, S1[, S2], K)
        chan = jnp.broadcast_to(
            jnp.arange(self.channel_dim)[None, None], symbols.shape)
        if self.window == 1:
            return tab[chan, states[0]]
        return tab[chan, states[0], states[1]]

    def __call__(self, symbols: jnp.ndarray, training: bool = True,
                 rng: Optional[jax.Array] = None):
        """Rate loss (bits/symbol) of integer data (N, S, C)."""
        logits = self.logits_for(symbols)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, symbols[..., None], axis=-1)[..., 0]
        bits = jnp.mean(nll) / jnp.log(2.0)
        return {"loss_rate": bits, "metrics": {"bits_per_symbol": bits}}

    # -- coding-table export -------------------------------------------------------
    def state_table_logits(self) -> jnp.ndarray:
        """Dense (C, S1..Sw, K) logits for EVERY finite state — the rows the
        native AR tables index at coding time. For the MLP method this
        enumerates all states through the net (reference update_state
        MLP3 path, autoregressive.py:810-823)."""
        C, K, S = self.channel_dim, self.categorical_dim, self.num_states
        if self.ar_method == "none":
            return self.prior_logits
        if self.ar_method == "table":
            return self.ar_table_logits
        states = list(itertools.product(range(S), repeat=self.window))
        st = jnp.asarray(states, jnp.int32)             # (M, W)
        feats = [jax.nn.one_hot(st[:, w], S) for w in range(self.window)]
        m = st.shape[0]
        out = []
        for c in range(C):
            chan = jnp.broadcast_to(jnp.eye(C)[c][None], (m, C))
            inp = jnp.concatenate(feats + [chan], axis=-1)
            out.append(self.fsar_mlp(inp) + self.prior_logits[c][None])
        tab = jnp.stack(out, 0)                          # (C, M, K)
        return tab.reshape((C,) + (S,) * self.window + (K,))


class FSARCodec(CodecInterface):
    """Lossless categorical codec over an FSARModel + native in-loop AR.

    compress/decompress operate on integer arrays of shape (..., C) with
    values in [0, categorical_dim); the trailing dim is the channel axis,
    everything before it is flattened into the spatial axis.
    """

    def __init__(self, model: FSARModel, params=None, coder_type: str = "rans",
                 trainer=None):
        self.model = model
        self.params = params
        self.coder_type = coder_type
        self.trainer = trainer
        self._enc = None
        self._dec = None
        self._loss_jit = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)["loss_rate"])

    def init_params(self, rng, sample_shape=(1, 16, 1)):
        sym = jnp.zeros(sample_shape, jnp.int32)
        self.params = self.model.init(rng, sym)["params"]
        return self.params

    def loss_fn(self, params, batch, rng=None):
        out = self.model.apply({"params": params}, jnp.asarray(batch, jnp.int32))
        return out["loss_rate"], dict(out["metrics"])

    def invalidate_coders(self):
        self._enc = self._dec = None

    # -- table building ------------------------------------------------------------
    def update_state(self, *args, **kwargs):
        m = self.model
        logits = np.asarray(self.model.apply(
            {"params": self.params}, method=FSARModel.state_table_logits))
        C, K, S, W = m.channel_dim, m.categorical_dim, m.num_states, m.window
        if m.ar_method == "none":
            pmf = _softmax_np(logits)                    # (C, K)
            rows = pmf
        else:
            pmf = _softmax_np(logits.reshape(-1, K))     # (C*S^W, K)
            rows = pmf
        if self.coder_type == "rans":
            cdfs, sizes, offs = export_cdf_tables(
                rows, np.zeros(rows.shape[0]), np.full(rows.shape[0], K),
                np.zeros(rows.shape[0], np.int32))
            self._enc = Rans64Encoder(bypass_coding=False)
            self._dec = Rans64Decoder(bypass_coding=False)
            self._enc.init_cdf_params(cdfs, sizes, offs)
            self._dec.init_cdf_params(cdfs, sizes, offs)
        else:
            # tANS counts (reference tans path: pmf * 2^table_log clamped to
            # >= 1, autoregressive.py:836-840).
            from ..coding.tans import TansDecoder, TansEncoder
            cnt = np.maximum((rows * (1 << 10)).astype(np.int32), 1)
            self._enc = TansEncoder(table_log=10, max_symbol_value=K - 1,
                                    bypass_coding=False)
            self._dec = TansDecoder(table_log=10, max_symbol_value=K - 1,
                                    bypass_coding=False)
            nfreqs = np.full(cnt.shape[0], K, np.int32)
            zoffs = np.zeros(cnt.shape[0], np.int32)
            self._enc.init_params(cnt, nfreqs, zoffs)
            self._dec.init_params(cnt, nfreqs, zoffs)

        if m.ar_method != "none":
            # tab[0, c, v0(, v1)] = cdf row of (channel c, state v):
            # rows were flattened in C-order over (c, v0[, v1]).
            shape = (C,) + (S,) * W
            tab = np.arange(int(np.prod(shape)), dtype=np.int32).reshape(shape)
            self._enc.init_ar_params(tab[None])
            self._dec.init_ar_params(tab[None])

    def _ensure_ready(self):
        if self._enc is None:
            self.update_state()

    def _coding_arrays(self, shape):
        """(indexes, ar_indexes, ar_offsets) for data of logical shape
        (1, S, C)."""
        m = self.model
        idx = np.broadcast_to(
            np.arange(m.channel_dim, dtype=np.int32), shape).reshape(-1)
        if m.ar_method == "none":
            return idx, None, None
        dim_offsets = [[ds, dc] for ds, dc in m.ar_offsets]
        ar_off = create_ar_offsets(shape, dim_offsets)
        ar_idx = np.zeros(shape, np.int32)
        return idx, ar_idx, ar_off

    def compress(self, data) -> bytes:
        self._ensure_ready()
        arr = np.asarray(data)
        C = self.model.channel_dim
        if arr.ndim < 1 or arr.shape[-1] != C:
            raise ValueError(f"data trailing dim must be {C}")
        orig_shape = arr.shape
        sym = arr.reshape(1, -1, C).astype(np.int32)
        idx, ar_idx, ar_off = self._coding_arrays(sym.shape)
        stream = self._enc.encode_with_indexes(
            sym.reshape(-1), idx, ar_indexes=ar_idx, ar_offsets=ar_off)
        return encode_shape(orig_shape) + stream

    def decompress(self, data: bytes):
        self._ensure_ready()
        shape, hdr = decode_shape(data)
        C = self.model.channel_dim
        logical = (1, int(np.prod(shape)) // C, C)
        idx, ar_idx, ar_off = self._coding_arrays(logical)
        sym = self._dec.decode_with_indexes(
            data[hdr:], idx, ar_indexes=ar_idx, ar_offsets=ar_off)
        return sym.reshape(shape)

    def estimate_bits(self, data) -> float:
        """NN-forward rate estimate (bits/symbol) of the trained model."""
        arr = np.asarray(data)
        sym = jnp.asarray(arr.reshape(1, -1, self.model.channel_dim), jnp.int32)
        return float(self._loss_jit(self.params, sym))


def _softmax_np(x: np.ndarray) -> np.ndarray:
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)
