"""Data-parallel mesh trainer config (parity: reference
trainer_configs/pl_gpu.py — accelerator=gpu, devices=-1, strategy=ddp;
here: shard the batch over the full 'data' mesh axis, XLA collectives
average the gradients)."""
config = dict(data_parallel=True)
