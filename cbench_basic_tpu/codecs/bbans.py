"""BB-ANS: bits-back coding with a latent-variable model.

Parity target: reference cbench/modules/entropy_coder/bbans.py (craystack-
style bits-back ANS over a VAE). Bits-back needs an ANS usable as a STACK —
pop (decode) during encoding to "sample" the latent from the posterior with
previously written bits, then push data and latent:

    encode(x):  z = pop q(z|x);  push x ~ p(x|z);  push z ~ p(z)
    decode():   z = pop p(z);    x = pop p(x|z);   push z ~ q(z|x)

The stack itself is an exact-integer Python rANS64 with the SAME state math
as the native coder (64-bit state, 16-bit precision, 32-bit renorm words) —
throughput is irrelevant here (the latent models are small); the hot
non-bits-back paths use the C++/TPU coders.
"""

from __future__ import annotations

import struct
from typing import List, Sequence, Tuple

import numpy as np

PRECISION = 16
LOW = 1 << 31
MASK16 = (1 << 16) - 1


class AnsStack:
    """Bidirectional rANS64: push/pop symbols under explicit CDF rows."""

    def __init__(self, words: List[int] | None = None, state: int | None = None):
        self.words = list(words) if words else []
        self.state = LOW if state is None else state

    # cdf: integer array, cdf[0]=0, cdf[-1]=2^16, strictly increasing.
    def push(self, symbol: int, cdf: np.ndarray):
        start = int(cdf[symbol])
        freq = int(cdf[symbol + 1]) - start
        x_max = ((LOW >> PRECISION) << 32) * freq
        if self.state >= x_max:
            self.words.append(self.state & 0xFFFFFFFF)
            self.state >>= 32
        self.state = ((self.state // freq) << PRECISION) + \
            (self.state % freq) + start

    def pop(self, cdf: np.ndarray) -> int:
        cum = self.state & MASK16
        symbol = int(np.searchsorted(cdf, cum, side="right")) - 1
        start = int(cdf[symbol])
        freq = int(cdf[symbol + 1]) - start
        self.state = freq * (self.state >> PRECISION) + cum - start
        if self.state < LOW:
            if not self.words:
                raise RuntimeError(
                    "ANS stack underflow — seed more initial bits")
            self.state = (self.state << 32) | self.words.pop()
        return symbol

    def to_bytes(self) -> bytes:
        head = struct.pack("<QI", self.state, len(self.words))
        return head + np.asarray(self.words, "<u4").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "AnsStack":
        state, n = struct.unpack("<QI", data[:12])
        words = np.frombuffer(data[12:12 + 4 * n], "<u4").tolist()
        return cls(words, state)


def _quantized_cdf(pmf: np.ndarray) -> np.ndarray:
    """Simple exact-integer CDF: every symbol gets freq >= 1."""
    pmf = np.maximum(np.asarray(pmf, np.float64), 1e-12)
    pmf = pmf / pmf.sum()
    freqs = np.maximum(np.round(pmf * ((1 << PRECISION) - len(pmf))), 1).astype(np.int64)
    # Fix the total exactly.
    diff = (1 << PRECISION) - int(freqs.sum())
    freqs[int(np.argmax(freqs))] += diff
    cdf = np.zeros(len(pmf) + 1, np.int64)
    cdf[1:] = np.cumsum(freqs)
    return cdf


class MixtureBBANSModel:
    """Default latent-variable model: bytes drawn from one of K Gaussian
    components; z = component index.

      p(z)    = uniform over K
      p(x|z)  = discretized Gaussian(mu_z, sigma_z) over [0, 256)
      q(z|x)  = posterior ∝ p(x|z) (exact for this model)
    """

    def __init__(self, num_components: int = 8, sigma: float | None = None):
        self.K = num_components
        self.mus = mus = np.linspace(16, 240, num_components)
        sigma = sigma if sigma is not None else 140.0 / num_components
        xs = np.arange(256)
        liks = np.exp(-0.5 * ((xs[None, :] - mus[:, None]) / sigma) ** 2)
        self.cond_pmf = liks / liks.sum(axis=1, keepdims=True)  # (K, 256)
        self.cond_cdf = np.stack([_quantized_cdf(p) for p in self.cond_pmf])
        self.prior_cdf = _quantized_cdf(np.full(self.K, 1.0 / self.K))

    def posterior_cdf(self, x: int) -> np.ndarray:
        post = self.cond_pmf[:, x]
        return _quantized_cdf(post / post.sum())


class BBANSCodec:
    """Lossless byte codec via bits-back coding over a latent-variable
    model. Symbols processed in reverse so decode runs forward."""

    def __init__(self, model: MixtureBBANSModel | None = None):
        self.model = model or MixtureBBANSModel()

    INITIAL_BITS_WORDS = 64  # bits-back bootstrap bits (fixed overhead)

    def compress(self, data) -> bytes:
        raw = bytes(data) if isinstance(data, (bytes, bytearray)) else \
            np.asarray(data, np.uint8).tobytes()
        m = self.model
        # Seed the stack so posterior pops never underflow; the cost is a
        # fixed header amortized over the message ("initial bits" of
        # bits-back coding).
        stack = AnsStack([0x9E3779B9] * self.INITIAL_BITS_WORDS)
        for x in reversed(raw):
            z = stack.pop(m.posterior_cdf(x))   # bits-back "sample"
            stack.push(x, m.cond_cdf[z])
            stack.push(z, m.prior_cdf)
        return struct.pack("<I", len(raw)) + stack.to_bytes()

    def decompress(self, data: bytes) -> bytes:
        (n,) = struct.unpack("<I", data[:4])
        m = self.model
        stack = AnsStack.from_bytes(data[4:])
        out = bytearray()
        for _ in range(n):
            z = stack.pop(m.prior_cdf)
            x = stack.pop(m.cond_cdf[z])
            stack.push(z, m.posterior_cdf(x))   # return the borrowed bits
            out.append(x)
        return bytes(out)


class VAEBBANSCodec:
    """Bits-back coding with a REAL VAE posterior (the original BB-ANS
    construction, Townsend et al. 2019 — parity: the reference's bbans.py
    VAE usage): continuous latents are discretized into equal-prior-mass
    bins (standard-normal quantile bins -> the bin-index prior is exactly
    uniform), the posterior q(z|x) Gaussian masses code/redeem the latent
    bins, and p(x|z) is a per-pixel discretized Gaussian from the decoder.

      rate/symbol ≈ -log p(x|z) - log p(z) + log q(z|x)  (the ELBO)

    Host numpy drives the stack; the VAE encode/decode are single jitted
    device calls per image.
    """

    def __init__(self, vae, params, image_shape, z_precision: int = 6,
                 x_sigma: float = 0.1):
        from scipy.special import ndtr, ndtri

        import jax

        self.vae = vae
        self.params = params
        self.image_shape = tuple(image_shape)   # (H, W, C)
        self.zp = z_precision
        self.x_sigma = x_sigma
        # jit the two model calls: one fused dispatch each (eager flax
        # apply dispatches per-op, which is pathological over a device
        # tunnel).
        self._enc_fn = jax.jit(lambda prm, x: vae.apply(
            {"params": prm}, x, method=type(vae).encode))
        self._dec_fn = jax.jit(lambda prm, z: vae.apply(
            {"params": prm}, z, method=type(vae).decode))
        nbins = 1 << z_precision
        # standard-normal equal-mass bin boundaries and centers
        qs = np.linspace(0.0, 1.0, nbins + 1)
        self._bounds = ndtri(np.clip(qs, 1e-7, 1 - 1e-7))
        self._centers = ndtri((np.arange(nbins) + 0.5) / nbins)
        self._prior_cdf = _quantized_cdf(np.full(nbins, 1.0 / nbins))
        self._ndtr = ndtr

    def _posterior_cdfs(self, mu: np.ndarray, sigma: np.ndarray):
        """Per-element quantized CDFs of the bin index under N(mu, sigma)."""
        z = (self._bounds[None, :] - mu[:, None]) / sigma[:, None]
        mass = np.diff(self._ndtr(z), axis=1)
        mass = np.maximum(mass, 1e-10)
        mass /= mass.sum(1, keepdims=True)
        return np.stack([_quantized_cdf(m) for m in mass])

    def _pixel_cdfs(self, means: np.ndarray):
        """Per-pixel quantized CDFs over [0,256) from decoder means [0,1]."""
        xs = (np.arange(257) - 0.5) / 255.0
        z = (xs[None, :] - means[:, None]) / self.x_sigma
        mass = np.diff(self._ndtr(z), axis=1)
        mass = np.maximum(mass, 1e-10)
        mass /= mass.sum(1, keepdims=True)
        return np.stack([_quantized_cdf(m) for m in mass])

    def _encode(self, img01):
        import jax.numpy as jnp
        mu, logvar = self._enc_fn(self.params, jnp.asarray(img01)[None])
        if not hasattr(self, "_z_shape"):
            self._z_shape = np.asarray(mu).shape[1:]
        return (np.asarray(mu)[0].reshape(-1),
                np.exp(0.5 * np.asarray(logvar)[0].reshape(-1)))

    @property
    def z_shape(self):
        if not hasattr(self, "_z_shape"):
            dummy = np.zeros(self.image_shape, np.float32)
            self._encode(dummy)
        return self._z_shape

    def _decode(self, z_bins):
        import jax.numpy as jnp
        z = self._centers[z_bins].reshape((1,) + self.z_shape)
        x_mean = np.asarray(self._dec_fn(
            self.params, jnp.asarray(z, np.float32)))[0]
        return np.clip(x_mean.reshape(-1), 0.0, 1.0)

    INITIAL_BITS_WORDS = 96

    def _initial_words(self, n_latents: int) -> int:
        """Seed size scaled to the latent count: each posterior pop consumes
        at most PRECISION (16) bits from the ancillary state, so a fixed seed
        underflows on large images / wide latents. Slack covers renorm
        granularity. The count never ships in the stream — decompress pops
        symbols until done and returns the borrowed bits regardless."""
        worst_bits = n_latents * PRECISION
        return max(self.INITIAL_BITS_WORDS, worst_bits // 32 + 16)

    def compress(self, img: np.ndarray) -> bytes:
        img = np.asarray(img, np.uint8)
        img01 = img.astype(np.float32) / 255.0
        mu, sigma = self._encode(img01)
        q_cdfs = self._posterior_cdfs(mu, sigma)

        stack = AnsStack([0x9E3779B9] * self._initial_words(len(mu)))
        z_bins = np.empty(len(mu), np.int64)
        for i in range(len(mu)):                 # bits-back "sample" of z
            z_bins[i] = stack.pop(q_cdfs[i])
        x_means = self._decode(z_bins)
        px_cdfs = self._pixel_cdfs(x_means)
        flat = img.reshape(-1)
        for p in reversed(range(len(flat))):
            stack.push(int(flat[p]), px_cdfs[p])
        for i in reversed(range(len(z_bins))):
            stack.push(int(z_bins[i]), self._prior_cdf)
        return stack.to_bytes()

    def decompress(self, data: bytes) -> np.ndarray:
        stack = AnsStack.from_bytes(data)
        h, w, c = self.image_shape
        n_lat = int(np.prod(self.z_shape))
        z_bins = np.empty(n_lat, np.int64)
        for i in range(n_lat):
            z_bins[i] = stack.pop(self._prior_cdf)
        x_means = self._decode(z_bins)
        px_cdfs = self._pixel_cdfs(x_means)
        flat = np.empty(h * w * c, np.uint8)
        for p in range(len(flat)):
            flat[p] = stack.pop(px_cdfs[p])
        img = flat.reshape(h, w, c)
        # return the borrowed posterior bits (restores the ancillary state)
        mu, sigma = self._encode(img.astype(np.float32) / 255.0)
        q_cdfs = self._posterior_cdfs(mu, sigma)
        for i in reversed(range(n_lat)):
            stack.push(int(z_bins[i]), q_cdfs[i])
        return img
