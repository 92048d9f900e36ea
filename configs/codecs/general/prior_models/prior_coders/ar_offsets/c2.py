"""Two previous channels (parity: reference prior_coders/ar_offsets/c2.py)."""
config = [(-1, 0, 0), (-2, 0, 0)]
