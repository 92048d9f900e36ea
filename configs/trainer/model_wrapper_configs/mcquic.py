"""Optimizer wrapper config (parity: reference
configs/trainer/model_wrapper_configs/mcquic.py — mcquic Adam 2e-4).
Keys are NeuralCodecTrainer / make_rd_optimizer kwargs."""
config = dict(optimizer="adam", learning_rate=0.0002,
              aux_learning_rate=0.002)
