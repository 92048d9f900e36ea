"""Host-side entropy-coding backends (native C++ via ctypes)."""

from .rans import Rans64Decoder, Rans64Encoder, pmf_to_quantized_cdf  # noqa: F401
from .ar_utils import create_ar_offsets, create_ar_offsets_multichannel  # noqa: F401
