"""No optimizer overrides (parity: model_wrapper_configs/empty.py)."""
config = dict()
