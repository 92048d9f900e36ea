"""Deterministic single-host trainer config (parity: reference
trainer_configs/pl_base.py — deterministic=True single-device). Keys are
NeuralCodecTrainer kwargs."""
config = dict(data_parallel=False, check_finite=True)
