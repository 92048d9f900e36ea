"""Per-row JSON serialization (parity: reference serialize/json.py)."""
config = dict(serialize_format="json", serialize_config=dict())
