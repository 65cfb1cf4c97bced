"""ML layer: anomaly detection over gold rollups (reference: ml/*.py)."""
