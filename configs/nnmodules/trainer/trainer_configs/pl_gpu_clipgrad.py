"""Accelerated + gradient clipping (parity: trainer_configs/pl_gpu_clipgrad.py — gradient_clip_val=1.0)."""
config = dict(data_parallel=True, grad_clip=1.0)
