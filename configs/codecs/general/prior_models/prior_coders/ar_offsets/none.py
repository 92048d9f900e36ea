"""No in-loop AR (parity: reference prior_coders/ar_offsets/none.py)."""
config = None
