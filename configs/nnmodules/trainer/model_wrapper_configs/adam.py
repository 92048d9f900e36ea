"""Adam 1e-3 (parity: model_wrapper_configs/adam.py)."""
config = dict(optimizer="adam", learning_rate=1e-3)
