"""Optimizer wrapper config (parity: reference
configs/trainer/model_wrapper_configs/emvb_adam.py — Adam 1e-4 main+aux).
Keys are NeuralCodecTrainer / make_rd_optimizer kwargs."""
config = dict(optimizer="adam", learning_rate=0.0001,
              aux_learning_rate=0.001)
