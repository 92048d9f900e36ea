"""Adam 1e-3 (parity: adam.py)."""
config = dict(optimizer="adam", learning_rate=1e-3)
