"""Optimizer wrapper config (parity: reference
configs/trainer/model_wrapper_configs/vqvae.py — VQ-VAE Adam 3e-4).
Keys are NeuralCodecTrainer / make_rd_optimizer kwargs."""
config = dict(optimizer="adam", learning_rate=0.0003,
              aux_learning_rate=0.0029999999999999996)
