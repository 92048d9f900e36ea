from .hyperprior import (  # noqa: F401
    AnalysisTransform,
    HyperAnalysisTransform,
    HyperSynthesisTransform,
    MeanScaleHyperprior,
    ScaleHyperprior,
    SynthesisTransform,
)
from .transgan import TransGANBlock, TransGANGenerator  # noqa: F401
from .unet import GeneratorUNet, UNetDown, UNetUp  # noqa: F401
from .vae import VAE, VAEDecoder, VAEEncoder  # noqa: F401
from .vqvae import (  # noqa: F401
    MultiVectorQuantizerWrapper,
    PyramidVQEmbedding,
    VQEmbeddingGSSoft,
    VQVAE,
    VectorQuantizerEMA,
)
