"""Learned topogroup predictor + ft-ssim objective tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cbench_basic_tpu.codecs.graph_codec import LatentGraphCodec
from cbench_basic_tpu.data import SyntheticImageDataset
from cbench_basic_tpu.graph.latent_graph import LatentGraphModel
from cbench_basic_tpu.graph.node_coders import FactorizedCoder, LossyDummyCoder
from cbench_basic_tpu.graph.topogroup import TopoGroupGaussianCoder
from cbench_basic_tpu.nn.models.hyperprior import (
    AnalysisTransform,
    HyperAnalysisTransform,
    HyperSynthesisTransform,
    SynthesisTransform,
)


def _learned_graph(N=12, M=16, G=4, distortion="mse"):
    node_coders = {
        "x": LossyDummyCoder(lmbda=0.01, distortion=distortion),
        "y": TopoGroupGaussianCoder(channels=M, pattern="learned",
                                    num_topo_groups=G, context_channels=32),
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


def test_learned_topogroup_train_and_roundtrip():
    model, specs = _learned_graph()
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))

    x = jnp.asarray(SyntheticImageDataset(1, 64, 64).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, _ = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # Gradient reaches the topogroup predictor.
    def f(p):
        l, _ = codec.loss_fn(p, x, jax.random.PRNGKey(2))
        return l
    grads = jax.grad(f)(codec.params)
    pred_grads = grads["node_coders_y"]["predictor"]
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(pred_grads))
    assert total > 0

    # Real coding round-trips with the learned (argmax) group map.
    img = SyntheticImageDataset(1, 64, 64).get_data_at(0)
    stream = codec.compress(img)
    rec = codec.decompress(stream)
    assert rec.shape == img.shape
    assert codec.compress(img) == stream


def test_learned_topogroup_encoder_decoder_agree():
    model, specs = _learned_graph(G=3)
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(1), input_shape=(1, 64, 64, 3))
    codec.update_state()
    img = SyntheticImageDataset(2, 64, 64).get_data_at(1)
    x, _ = codec._prep_image(img)
    values = codec._infer_fn(codec.params, x)
    decoded = {}
    pz = codec._prior_fn(codec.params, "z", decoded)
    _, zh = codec._encode_node("z", values["z"], pz)
    decoded["z"] = zh
    py = codec._prior_fn(codec.params, "y", decoded)
    coder = codec.model.node_coders["y"]
    stream, y_enc = coder.host_encode(codec, "y", values["y"], py,
                                      codec._coders["y"])
    y_dec = coder.host_decode(codec, "y", stream, py, values["y"].shape,
                              codec._coders["y"])
    np.testing.assert_array_equal(np.asarray(y_enc), np.asarray(y_dec))


def test_ssim_distortion_objective():
    model, specs = _learned_graph(distortion="ms_ssim")
    codec = LatentGraphCodec(model, specs)
    codec.init_params(jax.random.PRNGKey(0), input_shape=(1, 64, 64, 3))
    x = jnp.asarray(SyntheticImageDataset(1, 192, 192).get_data_at(0),
                    jnp.float32)[None] / 255.0
    loss, metrics = codec.loss_fn(codec.params, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "ms_ssim" in metrics
