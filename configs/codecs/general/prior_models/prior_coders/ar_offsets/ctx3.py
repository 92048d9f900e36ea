"""3-neighbor 2D context: left, top, top-left (parity: reference
prior_coders/ar_offsets/ctx3.py)."""
config = [(0, -1, 0), (0, 0, -1), (0, -1, -1)]
