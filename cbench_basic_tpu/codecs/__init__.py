from .base import (  # noqa: F401
    CodecInterface,
    VariableComplexityCodecInterface,
    VariableRateCodecInterface,
    VariableTaskCodecInterface,
    GroupedVariableRateCodec,
)
from .pycodecs import PILImageCodec  # noqa: F401
