"""AdaBelief, double-precision optimizer state (parity: adabelief_double_prec.py; on TPU optax keeps f32 state — the flag is recorded for name parity)."""
config = dict(optimizer="adabelief", learning_rate=1e-4)
