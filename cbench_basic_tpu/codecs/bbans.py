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
