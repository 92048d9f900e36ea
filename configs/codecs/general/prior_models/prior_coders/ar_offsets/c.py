"""Previous-channel AR window (parity: reference prior_coders/ar_offsets/c.py)."""
config = [(-1, 0, 0)]
