"""Per-row CSV serialization (parity: reference serialize/csv.py)."""
config = dict(serialize_format="csv",
              serialize_config=dict(index=False, header=False))
