"""Adam, double-precision state (parity: adam_double_prec.py; f32 optax state on TPU)."""
config = dict(optimizer="adam", learning_rate=1e-3)
