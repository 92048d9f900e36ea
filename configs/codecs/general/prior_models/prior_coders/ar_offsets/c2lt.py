"""Two channels + left + top (parity: reference prior_coders/ar_offsets/c2lt.py)."""
config = [(-1, 0, 0), (-2, 0, 0), (0, -1, 0), (0, 0, -1)]
