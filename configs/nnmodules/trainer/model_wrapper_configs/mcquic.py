"""McQuic recipe: Adam + low LR (parity: model_wrapper_configs/mcquic.py)."""
config = dict(optimizer="adam", learning_rate=2e-4)
