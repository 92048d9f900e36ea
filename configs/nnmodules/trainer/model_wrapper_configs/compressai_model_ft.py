"""Fine-tune Adam 1e-5 (parity: model_wrapper_configs/compressai_model_ft.py)."""
config = dict(optimizer="adam", learning_rate=1e-5, aux_learning_rate=1e-4)
