"""Adam 1e-4 + aux 1e-3 (parity: model_wrapper_configs/compressai_model.py)."""
config = dict(optimizer="adam", learning_rate=1e-4, aux_learning_rate=1e-3)
