"""AdaBelief 1e-6 (parity: adabelief_slow_e6.py)."""
config = dict(optimizer="adabelief", learning_rate=1e-6)
