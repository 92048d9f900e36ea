"""Neural image codec: flax hyperprior model + C++ rANS coding backend.

Parity target: the reference's GeneralCodec-with-hyperprior pipeline
(cbench/codecs/general_codec.py:44-130 compress/decompress flow;
prior_model/autoencoder.py extract/predict; compressai_coder.py coding
tables). TPU-first split: all tensor math (transforms, quantization, index
building) is jitted XLA; only the sequential rANS symbol coding runs on the
host, fed by int32 arrays DMA'd once per image.

Bitstream layout: merge_bytes([shape_header + y_stream, z_stream]).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.rans import Rans64Decoder, Rans64Encoder
from ..data.transforms import aligned_pad, unpad
from ..nn.entropy_models import export_cdf_tables
from ..utils.bytes_ops import decode_shape, encode_shape, merge_bytes, split_merged_bytes
from .base import CodecInterface, VariableRateCodecInterface


class NeuralImageCodec(CodecInterface):
    """Single-rate hyperprior codec over a trained parameter set."""

    def __init__(self, model, params: Optional[Dict] = None,
                 lmbda: float = 0.01, alignment: int = 64,
                 trainer=None):
        self.model = model
        self.params = params
        self.lmbda = lmbda
        self.alignment = alignment
        self.trainer = trainer
        self._coders_ready = False
        self._build_jitted()

    # -- jitted compute-path functions ---------------------------------------
    def _build_jitted(self):
        model = self.model

        @jax.jit
        def encode_fn(params, x):
            def run(m, x):
                y = m.analysis(x)
                z = m.hyper_analysis(y)
                medians = m.eb_medians().reshape(1, 1, 1, -1)
                z_sym = jnp.round(z - medians)
                z_hat = z_sym + medians
                scales, means = m.hyper_synthesis(z_hat)
                indexes = m.gaussian.build_indexes(scales)
                y_sym = jnp.round(y - means) if means is not None else jnp.round(y)
                return (z_sym.astype(jnp.int32), y_sym.astype(jnp.int32), indexes)
            return model.apply({"params": params}, x, method=run)

        @jax.jit
        def prior_fn(params, z_sym):
            def run(m, z_sym):
                medians = m.eb_medians().reshape(1, 1, 1, -1)
                z_hat = z_sym.astype(jnp.float32) + medians
                scales, means = m.hyper_synthesis(z_hat)
                indexes = m.gaussian.build_indexes(scales)
                return indexes, means
            return model.apply({"params": params}, z_sym, method=run)

        @jax.jit
        def synthesis_fn(params, y_sym, means):
            def run(m, y_sym, means):
                y_hat = y_sym.astype(jnp.float32)
                if means is not None:
                    y_hat = y_hat + means
                x_hat = m.synthesis(y_hat)
                return jnp.clip(x_hat, 0.0, 1.0)
            return model.apply({"params": params}, y_sym, means, method=run)

        @jax.jit
        def forward_fn(params, x, rng):
            return model.apply({"params": params}, x, training=True, rng=rng)

        @jax.jit
        def eval_forward_fn(params, x):
            return model.apply({"params": params}, x, training=False)

        self._encode_fn = encode_fn
        self._prior_fn = prior_fn
        self._synthesis_fn = synthesis_fn
        self.forward_fn = forward_fn
        self.eval_forward_fn = eval_forward_fn

    def init_params(self, rng: jax.Array, input_shape=(1, 256, 256, 3)) -> Dict:
        x = jnp.zeros(input_shape, jnp.float32)
        variables = self.model.init(rng, x, training=False)
        self.params = variables["params"]
        return self.params

    # -- coding tables ---------------------------------------------------------
    def update_state(self, *args, **kwargs):
        """Build rANS tables from the current entropy-model parameters.
        Parity: EntropyCoder.update_state / CompressAI .update()."""
        if self.params is None:
            raise ValueError("codec has no parameters; train or init first")
        pmf, tail, lengths, offsets = self.model.apply(
            {"params": self.params}, method=lambda m: m.eb_pmf_table())
        z_cdfs, z_sizes, z_offsets = export_cdf_tables(
            np.asarray(pmf), np.asarray(tail), np.asarray(lengths), np.asarray(offsets))

        gauss = self.model.gaussian if hasattr(self.model, "gaussian") else None
        if gauss is None:
            from ..nn.entropy_models import GaussianConditional
            gauss = GaussianConditional()
        g_pmf, g_tail, g_len, g_off = gauss.pmf_table()
        y_cdfs, y_sizes, y_offsets = export_cdf_tables(
            np.asarray(g_pmf), np.asarray(g_tail), np.asarray(g_len), np.asarray(g_off))

        self._z_enc = Rans64Encoder(bypass_coding=True)
        self._z_dec = Rans64Decoder(bypass_coding=True)
        self._z_enc.init_cdf_params(z_cdfs, z_sizes, z_offsets)
        self._z_dec.init_cdf_params(z_cdfs, z_sizes, z_offsets)
        self._y_enc = Rans64Encoder(bypass_coding=True)
        self._y_dec = Rans64Decoder(bypass_coding=True)
        self._y_enc.init_cdf_params(y_cdfs, y_sizes, y_offsets)
        self._y_dec.init_cdf_params(y_cdfs, y_sizes, y_offsets)
        self._coders_ready = True

    def invalidate_coders(self):
        self._coders_ready = False

    # -- compress / decompress ---------------------------------------------------
    def _prep_image(self, data) -> tuple:
        img = np.asarray(data)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        padded, size = aligned_pad(img, self.alignment)
        return padded[None], size

    def compress(self, data) -> bytes:
        if not self._coders_ready:
            self.update_state()
        x, (h, w) = self._prep_image(data)
        z_sym, y_sym, indexes = self._encode_fn(self.params, x)
        z_sym = np.asarray(z_sym)
        y_sym = np.asarray(y_sym)
        indexes = np.asarray(indexes)

        c = z_sym.shape[-1]
        z_idx = np.broadcast_to(np.arange(c, dtype=np.int32), z_sym.shape)
        z_stream = self._z_enc.encode_with_indexes(z_sym, z_idx)
        y_stream = self._y_enc.encode_with_indexes(y_sym, indexes)
        header = encode_shape((h, w))
        return merge_bytes([header + y_stream, z_stream], num_segments=2)

    def decompress(self, data: bytes):
        if not self._coders_ready:
            self.update_state()
        seg_y, z_stream = split_merged_bytes(data, num_segments=2)
        (h, w), hdr = decode_shape(seg_y)
        y_stream = seg_y[hdr:]
        ph = -(-h // self.alignment) * self.alignment
        pw = -(-w // self.alignment) * self.alignment
        zh, zw = ph // 64, pw // 64
        yh, yw = ph // 16, pw // 16
        c = self.model.N

        z_idx = np.broadcast_to(np.arange(c, dtype=np.int32), (1, zh, zw, c))
        z_sym = self._z_dec.decode_with_indexes(z_stream, z_idx)
        indexes, means = self._prior_fn(self.params, jnp.asarray(z_sym))
        y_sym = self._y_dec.decode_with_indexes(y_stream, np.asarray(indexes))
        x_hat = self._synthesis_fn(self.params, jnp.asarray(y_sym), means)
        img = np.asarray(x_hat[0])
        img = unpad(img, (h, w))
        return (img * 255.0 + 0.5).astype(np.uint8)

    # -- training glue -------------------------------------------------------------
    def loss_fn(self, params, x, rng):
        """RD loss: λ·255²·MSE + bpp (reference objective,
        configs/trainer/model_wrapper_configs/compressai_model.py)."""
        out = self.forward_fn(params, x, rng)
        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        bpp = sum(
            jnp.sum(-jnp.log2(lik)) for lik in out["likelihoods"].values()
        ) / num_pixels
        mse = jnp.mean((out["x_hat"] - x) ** 2)
        loss = self.lmbda * (255.0 ** 2) * mse + bpp
        return loss, {"loss": loss, "bpp": bpp, "mse": mse,
                      "psnr": -10 * jnp.log10(mse + 1e-12)}


class GroupedNeuralCodec(NeuralImageCodec, VariableRateCodecInterface):
    """Variable-rate facade over per-λ parameter sets sharing one model."""

    def __init__(self, model, param_sets, lmbdas, **kwargs):
        super().__init__(model, params=param_sets[0] if param_sets else None, **kwargs)
        self.param_sets = list(param_sets)
        self.lmbdas = list(lmbdas)
        self._level = 0

    @property
    def num_rate_levels(self):
        return len(self.param_sets)

    def set_rate_level(self, level: int, *args, **kwargs):
        self._level = level
        self.params = self.param_sets[level]
        self.lmbda = self.lmbdas[level]
        self._coders_ready = False
