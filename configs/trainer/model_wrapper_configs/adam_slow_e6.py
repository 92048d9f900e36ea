"""Adam 1e-6 (parity: adam_slow_e6.py)."""
config = dict(optimizer="adam", learning_rate=1e-6)
