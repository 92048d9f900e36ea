"""Gumbel-softmax temperature annealing scheme (parity: reference
prior_models/gs_anneal_scheme/anneal.py). Consumed by trainer
param_schedulers as per-node traced kwargs."""
config = dict(gs_anneal=True, gs_temp=2.0, gs_temp_min=0.1)
