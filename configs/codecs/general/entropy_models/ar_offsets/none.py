"""No in-loop AR (parity: reference ar_offsets/none.py)."""
config = None
