"""Combined dynamic entropy coder + lossless byte codec tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph.combined_coder import CombinedTopoGroupCoder
from cbench_basic_tpu.graph.latent_graph import LatentGraphModel
from cbench_basic_tpu.graph.node_coders import FactorizedCoder, LossyDummyCoder
from cbench_basic_tpu.nn.models.hyperprior import (
    AnalysisTransform,
    HyperAnalysisTransform,
    HyperSynthesisTransform,
    SynthesisTransform,
)


def _combined_graph(N=8, M=12):
    node_coders = {
        "x": LossyDummyCoder(lmbda=0.01),
        "y": CombinedTopoGroupCoder(
            channels=M, patterns=("checkerboard", "elic"),
            channel_groups=(1, 4), context_channels=24),
        "z": FactorizedCoder(N),
    }
    edges = {
        "x_y": AnalysisTransform(N, M),
        "y_z": HyperAnalysisTransform(N, use_abs=False),
        "z_y": HyperSynthesisTransform(N, out_channels=2 * M),
        "y_x": SynthesisTransform(N),
    }
    model = LatentGraphModel(
        node_coders=node_coders, edges=edges,
        inference_wiring=(("x_y", "x", "y"), ("y_z", "y", "z")),
        generative_wiring=(("z_y", "z", "y"), ("y_x", "y", "x")),
        generative_order=("z", "y", "x"))
    return model, {"x": (3, 1), "y": (M, 16), "z": (N, 64)}


def test_combined_coder_training_and_each_subcoder_roundtrip():
    model, specs = _combined_graph()
    levels = [{"coder:y": 0}, {"coder:y": 1}]
    codec = LatentGraphCodec(model, specs, complexity_levels=levels)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))

    x = jnp.asarray(SyntheticImageDataset(1, 64, 64).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, _ = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # Blend logits receive gradient (the dynamic-entropy-coder selector).
    def f(p):
        l, _ = codec.loss_fn(p, x, jax.random.PRNGKey(2))
        return l
    grads = jax.grad(f)(codec.params)
    assert float(jnp.abs(grads["node_coders_y"]["blend_logits"]).sum()) > 0

    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    streams = {}
    for lvl in range(2):
        codec.set_complex_level(lvl)
        stream = codec.compress(img)
        rec = codec.decompress(stream)
        assert rec.shape == img.shape
        streams[lvl] = stream
    # Different sub-coders -> different streams, each self-decoding.
    assert streams[0] != streams[1]


def test_lossless_byte_codecs_roundtrip():
    from cbench_basic_tpu.codecs.lossless import (
        Bz2Codec, LzmaCodec, ZlibCodec, ZstdCodec)
    rng = np.random.default_rng(0)
    # Compressible structured bytes.
    data = (np.sin(np.arange(4096) / 16) * 30 + 128).astype(np.uint8).reshape(64, 64)
    for cls in (ZstdCodec, ZlibCodec, LzmaCodec, Bz2Codec):
        codec = cls()
        out = codec.decompress(codec.compress(data))
        np.testing.assert_array_equal(out, data)
        assert len(codec.compress(data)) < data.nbytes

    # Zstd dictionary training.
    z = ZstdCodec()
    samples = [bytes(rng.integers(0, 50, 200).astype(np.uint8)) for _ in range(32)]
    z.train_dictionary(samples)
    out = z.decompress(z.compress(data))
    np.testing.assert_array_equal(out, data)
