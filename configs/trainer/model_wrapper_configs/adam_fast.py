"""Adam 1e-2 (parity: adam_fast.py)."""
config = dict(optimizer="adam", learning_rate=1e-2)
