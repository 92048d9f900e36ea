"""Channel + left (parity: reference ar_offsets/cl.py)."""
config = [(-1, 0, 0), (0, 0, -1)]
