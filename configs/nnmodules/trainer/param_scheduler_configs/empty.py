"""No param schedulers (parity: param_scheduler_configs/empty.py)."""
config = ()
