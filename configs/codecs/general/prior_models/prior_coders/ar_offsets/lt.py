"""Left + top neighbors (parity: reference prior_coders/ar_offsets/lt.py)."""
config = [(0, 0, -1), (0, -1, 0)]
