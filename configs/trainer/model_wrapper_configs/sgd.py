"""Optimizer wrapper config (parity: reference
configs/trainer/model_wrapper_configs/sgd.py — SGD momentum 0.9).
Keys are NeuralCodecTrainer / make_rd_optimizer kwargs."""
config = dict(optimizer="sgd", learning_rate=0.01,
              aux_learning_rate=0.1)
