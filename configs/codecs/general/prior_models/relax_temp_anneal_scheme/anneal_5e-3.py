"""Relaxation annealing, 5e-3 floor (parity: reference
relax_temp_anneal_scheme/anneal_5e-3.py)."""
config = dict(relax_temp_anneal=True, relax_temp=1.0, relax_temp_min=5e-3)
