"""No trainer-config overrides (parity: reference
configs/trainer/trainer_configs/empty.py)."""
config = dict()
