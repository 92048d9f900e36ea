"""Adam 1e-5 (parity: adam_slow_e5.py)."""
config = dict(optimizer="adam", learning_rate=1e-5)
