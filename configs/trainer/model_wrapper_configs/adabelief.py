"""AdaBelief 1e-4 (parity: reference model_wrapper_configs/adabelief.py)."""
config = dict(optimizer="adabelief", learning_rate=1e-4)
