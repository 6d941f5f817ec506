"""Table IO: a parquet-backed warehouse with per-stage lineage + resume
(catalog.py) and deterministic synthetic clips (synth.py)."""
