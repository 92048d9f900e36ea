"""Left + top neighbors (parity: reference ar_offsets/lt.py)."""
config = [(0, 0, -1), (0, -1, 0)]
