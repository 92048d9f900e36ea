"""Two left neighbors (parity: reference prior_coders/ar_offsets/l2.py)."""
config = [(0, 0, -1), (0, 0, -2)]
