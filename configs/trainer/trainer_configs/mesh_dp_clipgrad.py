"""Data-parallel mesh + gradient clipping (parity: reference
trainer_configs/pl_gpu_clipgrad.py — pl_gpu with gradient_clip_val=1)."""
config = dict(data_parallel=True, grad_clip=1.0)
