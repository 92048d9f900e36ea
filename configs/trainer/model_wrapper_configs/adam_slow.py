"""Adam 1e-4 (parity: adam_slow.py)."""
config = dict(optimizer="adam", learning_rate=1e-4)
