"""Deterministic single-device run (parity: trainer_configs/pl_base.py)."""
config = dict(data_parallel=False, check_finite=True)
