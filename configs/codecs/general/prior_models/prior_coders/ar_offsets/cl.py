"""Channel + left (parity: reference prior_coders/ar_offsets/cl.py)."""
config = [(-1, 0, 0), (0, 0, -1)]
