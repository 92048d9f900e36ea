"""VQ-VAE codec: code indices entropy-coded with a learned categorical.

Parity: the reference's VQ prior-coder family (prior_coder zoo,
prior_coder/__init__.py VQ coders) in its simplest production form — a
latent-free (single-level) VQ codec whose bitstream is the rANS-coded index
plane under the learned index prior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.rans import Rans64Decoder, Rans64Encoder, pmf_to_quantized_cdf
from ..data.transforms import aligned_pad, unpad
from ..utils.bytes_ops import decode_shape, encode_shape
from .base import CodecInterface, SelfTrainableInterface


class VQVAECodec(CodecInterface, SelfTrainableInterface):
    def __init__(self, model, params=None, vq_stats=None, alignment: int = 4):
        self.model = model
        self.params = params
        self.vq_stats = vq_stats
        self.alignment = alignment
        self._ready = False

        @jax.jit
        def encode_fn(variables, x):
            return model.apply(variables, x, method=model.encode_indices)

        @jax.jit
        def decode_fn(variables, indices):
            return model.apply(variables, indices, method=model.decode_indices)

        @jax.jit
        def forward_fn(variables, x, rng):
            out, mut = model.apply(variables, x, training=True,
                                   mutable=["vq_stats"])
            return out, mut

        self._encode_fn = encode_fn
        self._decode_fn = decode_fn
        self.forward_fn = forward_fn

    def init_params(self, rng, input_shape=(1, 64, 64, 3)):
        variables = self.model.init(rng, jnp.zeros(input_shape), training=False)
        self.params = variables["params"]
        # gssoft/pyramid quantizers carry no EMA state: empty collection.
        self.vq_stats = variables.get("vq_stats", {})
        return self.params

    @property
    def variables(self):
        return {"params": self.params, "vq_stats": self.vq_stats}

    def loss_fn(self, params, x, rng):
        out, mut = self.forward_fn({"params": params,
                                    "vq_stats": self.vq_stats}, x, rng)
        num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
        # code_bits == -sum log2(likelihoods) for single-map quantizers and
        # the (constant) uniform-prior cost for multi-map ones, which emit
        # no "likelihoods" entry
        bpp = out["metrics"]["code_bits"] / num_pixels
        loss = bpp + sum(out["losses"].values())
        return loss, {"loss": loss, "bpp": bpp, **out["metrics"]}

    def train_self(self):
        """Self-training loop (SelfTrainableInterface): adam over
        bpp + VQ losses with the mutable EMA vq_stats threaded through
        each jitted step. The attached trainer supplies dataloader /
        num_epochs / learning_rate; the loop itself is VQ-specific
        because of the mutable-collection update (a plain trainer cannot
        carry vq_stats).

        Parity: the reference's selftrain VQ prior models
        (configs/codecs/general/prior_models/vqvae_selftrain*.py over
        SelfTrainableModule)."""
        t = self.trainer
        if t is None:
            return {}
        import optax
        if self.params is None:
            self.init_params(jax.random.PRNGKey(getattr(t, "seed", 0)))
        lr = getattr(t, "learning_rate", 1e-3)
        tx = optax.adam(lr if np.isscalar(lr) else 1e-3)
        opt_state = tx.init(self.params)
        model = self.model

        @jax.jit
        def step(params, vq_stats, opt_state, x, rng):
            def loss(p):
                out, mut = model.apply(
                    {"params": p, "vq_stats": vq_stats}, x, training=True,
                    rng=rng, mutable=["vq_stats"])
                num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
                # code_bits covers multi-map quantizers too (no
                # "likelihoods" entry there; see loss_fn)
                bpp = out["metrics"]["code_bits"] / num_pixels
                total = bpp + sum(out["losses"].values())
                return total, (mut["vq_stats"], bpp)
            (l, (new_stats, bpp)), grads = jax.value_and_grad(
                loss, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), new_stats,
                    opt_state, l, bpp)

        params, vq_stats = self.params, self.vq_stats
        rng = jax.random.PRNGKey(getattr(t, "seed", 0) + 1)
        last = {}
        for _ in range(max(1, getattr(t, "num_epochs", 1))):
            for batch in t.dataloader:
                x = jnp.asarray(np.asarray(batch), jnp.float32)
                if x.ndim == 3:
                    x = x[None]
                if x.max() > 1.5:
                    x = x / 255.0
                rng, sub = jax.random.split(rng)
                params, vq_stats, opt_state, l, bpp = step(
                    params, vq_stats, opt_state, x, sub)
                last = {"loss": float(l), "bpp": float(bpp)}
        self.params, self.vq_stats = params, vq_stats
        self._ready = False  # tables must rebuild from the new prior
        return last

    def update_state(self, *args, **kwargs):
        if self.params is None:
            # benchmark path without a trainer/checkpoint: random-weight
            # stand-in (zero-egress env; see configs/nn.py)
            self.init_params(jax.random.PRNGKey(0))
        pmf = np.asarray(self.model.apply(self.variables,
                                          method=self.model.index_pmf))
        cdf = np.array([pmf_to_quantized_cdf(
            np.maximum(pmf, 1e-9).astype(np.float32), 16)], np.int32)
        sizes = np.array([cdf.shape[1]], np.int32)
        offs = np.zeros(1, np.int32)
        self._enc = Rans64Encoder(bypass_coding=True)
        self._dec = Rans64Decoder(bypass_coding=True)
        self._enc.init_cdf_params(cdf, sizes, offs)
        self._dec.init_cdf_params(cdf, sizes, offs)
        self._ready = True

    def compress(self, data) -> bytes:
        if not self._ready:
            self.update_state()
        img = np.asarray(data)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        padded, (h, w) = aligned_pad(img, self.alignment)
        idx_out = self._encode_fn(self.variables, padded[None])
        # multi-map quantizers (pyramid scales / channel splits) emit a
        # LIST of index maps: concatenate into one symbol stream (shapes
        # are reconstructed from index_map_shapes at decode)
        maps = idx_out if isinstance(idx_out, (list, tuple)) else [idx_out]
        symbols = np.concatenate(
            [np.asarray(m).reshape(-1) for m in maps]).astype(np.int32)
        stream = self._enc.encode_with_indexes(
            symbols, np.zeros(symbols.size, np.int32))
        return encode_shape((h, w)) + stream

    def decompress(self, data: bytes):
        if not self._ready:
            self.update_state()
        (h, w), hdr = decode_shape(data)
        ph = -(-h // self.alignment) * self.alignment
        pw = -(-w // self.alignment) * self.alignment
        shapes = self.model.index_map_shapes(ph, pw)
        total = sum(mh * mw for mh, mw in shapes)
        syms = np.asarray(self._dec.decode_with_indexes(
            data[hdr:], np.zeros(total, np.int32))).reshape(-1)
        if len(shapes) == 1:
            arg = jnp.asarray(syms.reshape((1,) + shapes[0]))
        else:
            arg, off = [], 0
            for mh, mw in shapes:
                arg.append(jnp.asarray(syms[off:off + mh * mw]
                                       .reshape(1, mh, mw)))
                off += mh * mw
        x_hat = np.asarray(self._decode_fn(self.variables, arg))[0]
        return (unpad(x_hat, (h, w)) * 255.0 + 0.5).astype(np.uint8)
