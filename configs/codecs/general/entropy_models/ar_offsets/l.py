"""Left neighbor (parity: reference ar_offsets/l.py)."""
config = [(0, 0, -1)]
