"""Constant relaxation temperature (parity: reference
relax_temp_anneal_scheme/const.py)."""
config = dict(relax_temp_anneal=False, relax_temp=0.5)
