"""Constant Gumbel-softmax temperature (parity: reference
prior_models/gs_anneal_scheme/const.py)."""
config = dict(gs_anneal=False, gs_temp=0.5)
