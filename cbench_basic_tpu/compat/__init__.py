"""Reference-interop compat layer.

Bit-compatible re-implementations of the reference cbench_BaSIC entropy
modules' coding paths, so streams written by the reference (torch/pybind11)
can be decoded here and vice versa. These are host-side numpy pipelines over
the repo's native coders — interop surface, NOT the TPU compute path (that
is ``graph/``/``codecs/``; see docs/performance.md).

Verified byte-for-byte against compiled-reference module bitstreams in
tests/test_module_golden.py (artifact: tests/golden/ref_module_golden.npz).
"""

from .ref_categorical import RefCategoricalCoder
from .ref_rans_prior import RefRansPriorCoder, batched_quantized_cdf
from .ref_gaussian import (
    RefFSARPriorConfig,
    RefGaussianGridCoder,
    RefLinearARConfig,
)

__all__ = [
    "RefGaussianGridCoder",
    "RefFSARPriorConfig",
    "RefLinearARConfig",
    "RefCategoricalCoder",
    "RefRansPriorCoder",
    "batched_quantized_cdf",
]
