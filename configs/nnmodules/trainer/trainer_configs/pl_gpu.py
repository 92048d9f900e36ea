"""Accelerated run -> data-parallel device mesh (parity: trainer_configs/pl_gpu.py — gpus=1; here the jax.sharding mesh)."""
config = dict(data_parallel=True)
