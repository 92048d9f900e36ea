"""Optimizer wrapper config (parity: reference
configs/trainer/model_wrapper_configs/emvb_adam_e6.py — Adam 1e-6).
Keys are NeuralCodecTrainer / make_rd_optimizer kwargs."""
config = dict(optimizer="adam", learning_rate=1e-06,
              aux_learning_rate=1e-05)
