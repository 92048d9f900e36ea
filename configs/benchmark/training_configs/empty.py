"""No training-config overrides (parity: reference
configs/benchmark/training_configs/empty.py)."""
config = dict()
