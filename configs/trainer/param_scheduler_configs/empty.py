"""No param schedulers (parity: reference
configs/trainer/param_scheduler_configs/empty.py)."""
config = []
