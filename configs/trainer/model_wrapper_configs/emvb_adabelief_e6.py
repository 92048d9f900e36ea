"""Optimizer wrapper config (parity: reference
configs/trainer/model_wrapper_configs/emvb_adabelief_e6.py — AdaBelief 1e-6).
Keys are NeuralCodecTrainer / make_rd_optimizer kwargs."""
config = dict(optimizer="adabelief", learning_rate=1e-06,
              aux_learning_rate=1e-05)
