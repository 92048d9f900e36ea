"""Channel + left + top (parity: reference prior_coders/ar_offsets/clt.py)."""
config = [(-1, 0, 0), (0, -1, 0), (0, 0, -1)]
