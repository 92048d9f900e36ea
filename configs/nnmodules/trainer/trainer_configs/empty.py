"""No trainer overrides (parity: reference trainer_configs/empty.py)."""
config = dict()
