"""Three-way AR window: left, top, top-left (parity: reference
ar_offsets/twar.py — the 3-way image-predictor neighborhood)."""
config = [(0, 0, -1), (0, -1, 0), (0, -1, -1)]
