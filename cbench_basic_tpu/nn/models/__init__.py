from .hyperprior import (  # noqa: F401
    AnalysisTransform,
    HyperAnalysisTransform,
    HyperSynthesisTransform,
    MeanScaleHyperprior,
    ScaleHyperprior,
    SynthesisTransform,
)
