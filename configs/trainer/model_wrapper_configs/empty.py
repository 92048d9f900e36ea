"""No optimizer overrides (parity: reference
model_wrapper_configs/empty.py)."""
config = dict()
