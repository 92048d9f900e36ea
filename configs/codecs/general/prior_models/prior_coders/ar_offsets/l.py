"""Left neighbor (parity: reference prior_coders/ar_offsets/l.py)."""
config = [(0, 0, -1)]
