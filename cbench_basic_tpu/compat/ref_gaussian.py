"""Bit-compatible port of the reference GaussianDistributionEntropyCoder.

Reference: cbench/modules/entropy_coder/dist_entropy.py:608-807 (grid +
index selection + table export), :184-605 (finite-state / linear AR), and
the module encode/decode driver in entropy_coder/ans.py:78-136 (a module
stream is exactly one encode_with_indexes call — no extra header).

The semantics replicated here, in the reference's own float-dtype dance
(the grid is float64 because torch.as_tensor over numpy scalars infers
float64; the evaluation points pass through a float32 buffer; prior maps
and MLPs are float32):

- mean x logvar grid, row index = mean_idx * logvar_levels + logvar_idx
  (dist_entropy.py:650-669, 756-783)
- integer freq tables: softmax(log_softmax(Normal.log_prob(pts)))
  * 2^freq_precision, clamp-min 1, truncated to int32
  (dist_entropy.py:98-111, 671-677)
- symbols: round((data - lo)/step) mod P (torch_base.py:32-43, ans.py:67-71)
- finite-state AR: per-channel MLP evaluated over all (P+1)^window neighbor
  states builds a lookup table of grid indexes; coding biases the prior by
  the MLP's all-default output (dist_entropy.py:505-601)
- linear AR: per-channel clamped scaled-add ops on the grid index
  (dist_entropy.py:732-748, csrc/ans/ar_funcs.hpp:57-92)

Byte-for-byte equality with compiled-reference streams is pinned by
tests/test_module_golden.py. Known platform caveat: the float64 exp/log in
table quantization can differ from torch's libm by 1 ulp, which flips an
integer count roughly 1e-5 of the time on other libms; the golden test
asserts exact equality on this artifact.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import numpy as np

from ..coding.ar_utils import create_ar_offsets
from ..coding.rans import Rans64Decoder, Rans64Encoder

_LOG_SQRT_2PI = math.log(math.sqrt(2 * math.pi))


def _log_softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(-1, keepdims=True)
    return x - m - np.log(np.exp(x - m).sum(-1, keepdims=True))


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(-1, keepdims=True)


def _leaky_relu(x: np.ndarray, slope: np.float32 = np.float32(0.01)):
    return np.where(x >= 0, x, x * slope)


@dataclasses.dataclass
class RefFSARPriorConfig:
    """Finite-state AR: per-channel 3-layer MLPs (Linear/LeakyReLU x2/Linear)
    over `window` causal neighbor samples (dist_entropy.py:246-259)."""

    mlps: Sequence[Sequence[tuple]]  # per channel: [(W, b), (W, b), (W, b)]
    ar_offsets: np.ndarray           # (window, ndim_after_batch) dim offsets
    use_default_bias: bool = True


@dataclasses.dataclass
class RefLinearARConfig:
    """Linear AR: grouped conv1d weights exported as clamped scaled-add ops
    on the flattened grid index (dist_entropy.py:732-748)."""

    weight: np.ndarray  # (C*out, 1, window) float32 (torch Conv1d layout)
    bias: np.ndarray    # (C*out,) float32
    ar_offsets: np.ndarray


class RefGaussianGridCoder:
    """data_range/data_precision and grid knobs mirror the reference ctor
    (dist_entropy.py:608-637; defaults logvar -7..0)."""

    def __init__(self, data_range=(0.0, 1.0), data_precision: int = 256,
                 logvar_min: float = -7.0, logvar_max: float = 0.0,
                 logvar_step: float = 0.5, mean_min=None, mean_max=None,
                 mean_step=None, channel_dim: Optional[int] = None,
                 freq_precision: int = 16, bypass_coding: bool = False,
                 mean_as_offset: bool = False,
                 coder_type: str = "rans64",
                 ar: Optional[object] = None):
        self.mean_as_offset = mean_as_offset
        self.coder_type = coder_type
        self.data_range = (float(data_range[0]), float(data_range[1]))
        self.data_precision = int(data_precision)
        self.freq_precision = int(freq_precision)
        self.bypass_coding = bypass_coding
        self.channel_dim = channel_dim
        self.ar = ar

        self.data_step = (self.data_range[1] - self.data_range[0]) \
            / (self.data_precision - 1)
        self.logvar_min, self.logvar_max, self.logvar_step = \
            logvar_min, logvar_max, logvar_step
        self.logvar_levels = len(np.arange(
            logvar_min, logvar_max + logvar_step, logvar_step))
        self.mean_min = self.data_range[0] if mean_min is None else mean_min
        self.mean_max = self.data_range[1] if mean_max is None else mean_max
        self.mean_step = self.data_step if mean_step is None else mean_step
        self.mean_levels = len(np.arange(
            self.mean_min, self.mean_max + self.mean_step, self.mean_step))
        # default AR sample sits outside the data range
        # (dist_entropy.py:221: data_range[0] - data_range[1])
        self.ar_default_sample = self.data_range[0] - self.data_range[1]

        self._enc = None
        self._dec = None
        self._default_ar_prior = None

    @property
    def data_mid(self) -> float:
        return (self.data_range[1] + self.data_range[0]) / 2

    # -- grid + tables (dist_entropy.py:650-677, 98-111) ----------------------
    def dist_params(self) -> np.ndarray:
        params = []
        if self.mean_as_offset:
            # one dist per logvar level, centered at data_mid (:657-659)
            for logvar in np.arange(self.logvar_min,
                                    self.logvar_max + self.logvar_step,
                                    self.logvar_step):
                params.append((self.data_mid, logvar))
            return np.asarray(params, np.float64)
        for mean in np.arange(self.mean_min, self.mean_max + self.mean_step,
                              self.mean_step):
            for logvar in np.arange(self.logvar_min,
                                    self.logvar_max + self.logvar_step,
                                    self.logvar_step):
                params.append((mean, logvar))
        return np.asarray(params, np.float64)

    def _eval_points(self) -> np.ndarray:
        """Grid evaluation points: an f32 arange re-read into f64 math
        (torch.arange default dtype is f32; .type_as + the f32 buffer in
        _truncated_dist_to_logits keep the f32-quantized values)."""
        pts = np.arange(self.data_range[0],
                        self.data_range[1] + self.data_step, self.data_step)
        return pts.astype(np.float32).astype(np.float64)[:self.data_precision]

    def build_tables(self):
        params = self.dist_params()
        mean, logvar = params[:, :1], params[:, 1:]
        scale = np.exp(logvar)
        x = self._eval_points()[None, :]
        log_scale = np.log(scale)
        logprob = -((x - mean) ** 2) / (2 * scale ** 2) - log_scale \
            - _LOG_SQRT_2PI
        pmf = _softmax(_log_softmax(logprob))
        cnt = np.maximum(pmf * (1 << self.freq_precision), 1.0)
        freqs = cnt.reshape(-1, self.data_precision).astype(np.int32)
        n = len(freqs)
        return (freqs, np.full(n, self.data_precision, np.int32),
                np.zeros(n, np.int32))

    # -- index selection / symbol mapping (dist_entropy.py:756-783) ----------
    def select_indexes(self, prior: np.ndarray) -> np.ndarray:
        prior = np.asarray(prior, np.float32)
        prior_mean = prior[..., 0]
        prior_logvar = prior[..., 1]
        if self.mean_as_offset:
            # scale index only (:762-765); the mean codes as a symbol offset
            return np.clip(
                np.round((prior_logvar - np.float32(self.logvar_min))
                         / np.float32(self.logvar_step)),
                0, self.logvar_levels - 1).astype(np.int64)
        mean_idx = np.clip(
            np.round((prior_mean - np.float32(self.mean_min))
                     / np.float32(self.mean_step)),
            0, self.mean_levels - 1).astype(np.int64)
        scale_idx = np.clip(
            np.round((prior_logvar - np.float32(self.logvar_min))
                     / np.float32(self.logvar_step)),
            0, self.logvar_levels - 1).astype(np.int64)
        return mean_idx * self.logvar_levels + scale_idx

    def preprocess(self, data: np.ndarray) -> np.ndarray:
        data = np.asarray(data, np.float32)
        sym = np.round((data - np.float32(self.data_range[0]))
                       / np.float32(self.data_step)).astype(np.int64)
        return (sym % self.data_precision).astype(np.int32)

    def postprocess(self, symbols: np.ndarray) -> np.ndarray:
        return symbols.astype(np.float32) * np.float32(self.data_step) \
            + np.float32(self.data_range[0])

    def _preprocess_with_prior(self, data, prior):
        """mean_as_offset: symbols shift by the quantized prior mean mod P
        (dist_entropy.py:785-795); otherwise plain preprocess."""
        sym = self.preprocess(data)
        if not self.mean_as_offset:
            return sym
        mean_off = self.preprocess(np.asarray(prior, np.float32)[..., 0])
        mid = int(self.data_mid * self.data_precision)
        return ((sym + mid - mean_off) % self.data_precision).astype(np.int32)

    def _postprocess_with_prior(self, symbols, prior):
        if not self.mean_as_offset:
            return self.postprocess(symbols)
        mean_off = self.preprocess(np.asarray(prior, np.float32)[..., 0])
        mid = int(self.data_mid * self.data_precision)
        sym = (symbols + mean_off - mid) % self.data_precision
        return self.postprocess(sym)

    # -- finite-state AR lookup construction (dist_entropy.py:563-601) -------
    def _mlp_forward(self, mlp, x: np.ndarray) -> np.ndarray:
        h = x.astype(np.float32)
        for i, (w, b) in enumerate(mlp):
            h = h @ np.asarray(w, np.float32).T + np.asarray(b, np.float32)
            if i < len(mlp) - 1:
                h = _leaky_relu(h)
        return h

    def build_ar_lookup(self):
        assert isinstance(self.ar, RefFSARPriorConfig)
        P = self.data_precision
        window = len(self.ar.ar_offsets)
        states = self.postprocess(np.arange(P))
        states = np.concatenate(
            [[np.float32(self.ar_default_sample)], states]).astype(np.float32)
        # itertools.product order == nested loops, first axis slowest
        grids = np.meshgrid(*([states] * window), indexing="ij")
        ar_input = np.stack([g.reshape(-1) for g in grids], axis=-1)

        params = self.dist_params()
        tables, defaults = [], []
        default_input = np.full_like(ar_input, self.ar_default_sample)
        for mlp in self.ar.mlps:
            out = self._mlp_forward(mlp, ar_input)
            dflt = self._mlp_forward(mlp, default_input)
            defaults.append(dflt[0])
            if self.ar.use_default_bias:
                out = out - dflt
            # grid f64 -> f32 (type_as(ar_prior_reshape)), + per-state offset
            prior_params = params.astype(np.float32)[:, None, :] + out[None]
            tables.append(self.select_indexes(prior_params))
        lookup = np.stack(tables).reshape(
            len(self.ar.mlps), len(params), *([P + 1] * window))
        self._default_ar_prior = np.stack(defaults)  # (C, 2) f32
        return lookup.astype(np.int32)

    def default_ar_prior(self) -> np.ndarray:
        if self._default_ar_prior is None:
            self.build_ar_lookup()
        return self._default_ar_prior

    # -- linear AR op export (dist_entropy.py:732-748) ------------------------
    def linear_ar_ops(self):
        assert isinstance(self.ar, RefLinearARConfig)
        w = np.asarray(self.ar.weight, np.float32)
        b = np.asarray(self.ar.bias, np.float32)
        ops = []
        for i in range(self.channel_dim):
            wi = (w[i].reshape(-1) * np.float32(self.mean_levels - 1)
                  / np.float32(self.data_precision - 1))
            bi = np.float32(float(b[i]) * (self.mean_levels - 1))
            ops.append((wi.tolist(), float(bi), float(self.logvar_levels),
                        0.0, float(self.mean_levels - 1)))
        return ops

    # -- coder assembly -------------------------------------------------------
    def update_state(self):
        freqs, nfreqs, offsets = self.build_tables()
        if self.coder_type == "tans":
            # reference ANSEntropyCoder.update_state tans branch
            # (entropy_coder/ans.py:142-144): table_log = freq_precision,
            # max symbol = data_precision - 1
            from ..coding.tans import TansDecoder, TansEncoder
            enc = TansEncoder(table_log=self.freq_precision,
                              max_symbol_value=self.data_precision - 1,
                              bypass_coding=self.bypass_coding)
            dec = TansDecoder(table_log=self.freq_precision,
                              max_symbol_value=self.data_precision - 1,
                              bypass_coding=self.bypass_coding)
        else:
            enc = Rans64Encoder(freq_precision=self.freq_precision,
                                bypass_coding=self.bypass_coding)
            dec = Rans64Decoder(freq_precision=self.freq_precision,
                                bypass_coding=self.bypass_coding)
        enc.init_params(freqs, nfreqs, offsets)
        dec.init_params(freqs, nfreqs, offsets)
        if isinstance(self.ar, RefFSARPriorConfig):
            lookup = self.build_ar_lookup()
            enc.init_ar_params(lookup)
            dec.init_ar_params(lookup)
        elif isinstance(self.ar, RefLinearARConfig):
            ops = self.linear_ar_ops()
            enc.init_custom_ar_ops(ops)
            dec.init_custom_ar_ops(ops)
        self._enc, self._dec = enc, dec

    def _coding_prior(self, prior: np.ndarray) -> np.ndarray:
        """Bias the prior by the MLPs' all-default output so lookup entries
        (built relative to default) compose correctly
        (dist_entropy.py:505-531)."""
        prior = np.asarray(prior, np.float32)
        if (isinstance(self.ar, RefFSARPriorConfig)
                and self.ar.use_default_bias):
            dap = self.default_ar_prior()  # (C, 2)
            prior = prior + dap[None, :, None, None, :]
        return prior

    def _ar_args(self, prior_shape):
        if self.ar is None:
            return None, None
        if isinstance(self.ar, RefFSARPriorConfig):
            # per-channel MLPs -> table index = channel (dist_entropy:322-327)
            b, c = prior_shape[0], prior_shape[1]
            spatial = int(np.prod(prior_shape[2:]))
            ar_idx = np.broadcast_to(
                np.arange(c, dtype=np.int32)[None, :, None],
                (b, c, spatial)).reshape(prior_shape)
        else:
            ar_idx = np.zeros(prior_shape, np.int32)
        ar_off = create_ar_offsets(prior_shape, self.ar.ar_offsets)
        return ar_idx, ar_off

    def encode(self, data: np.ndarray, prior: np.ndarray) -> bytes:
        if self._enc is None:
            self.update_state()
        prior = self._coding_prior(prior)
        indexes = self.select_indexes(prior)
        symbols = self._preprocess_with_prior(data, prior)
        ar_idx, ar_off = self._ar_args(indexes.shape)
        return self._enc.encode_with_indexes(
            symbols.reshape(-1), indexes.reshape(-1).astype(np.int32),
            ar_indexes=ar_idx, ar_offsets=ar_off)

    def decode(self, stream: bytes, prior: np.ndarray) -> np.ndarray:
        if self._dec is None:
            self.update_state()
        prior = self._coding_prior(prior)
        indexes = self.select_indexes(prior)
        ar_idx, ar_off = self._ar_args(indexes.shape)
        symbols = self._dec.decode_with_indexes(
            stream, indexes.reshape(-1).astype(np.int32),
            ar_indexes=ar_idx, ar_offsets=ar_off)
        return self._postprocess_with_prior(
            np.asarray(symbols).reshape(indexes.shape), prior)
