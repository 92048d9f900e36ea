"""Optimizer wrapper config (parity: reference
configs/trainer/model_wrapper_configs/sgd_slow_e4.py — slow SGD 1e-4).
Keys are NeuralCodecTrainer / make_rd_optimizer kwargs."""
config = dict(optimizer="sgd", learning_rate=0.0001,
              aux_learning_rate=0.001)
