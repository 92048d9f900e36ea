"""Relaxation temperature annealing (parity: reference
prior_models/relax_temp_anneal_scheme/anneal.py)."""
config = dict(relax_temp_anneal=True, relax_temp=1.0, relax_temp_min=0.05)
