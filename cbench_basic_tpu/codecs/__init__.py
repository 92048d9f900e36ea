from .base import (  # noqa: F401
    CodecInterface,
    VariableComplexityCodecInterface,
    VariableRateCodecInterface,
    VariableTaskCodecInterface,
    GroupedVariableRateCodec,
)
from .pycodecs import PILImageCodec  # noqa: F401
from .table_code import TableCodeCodec, TrainableTableCodeCodec  # noqa: F401
