"""Previous-channel AR window (parity: reference ar_offsets/c.py)."""
config = [(-1, 0, 0)]
