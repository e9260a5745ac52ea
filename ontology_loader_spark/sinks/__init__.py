"""Sinks: TSV report writer (K1), parquet-backed state store standing
in for Iceberg MERGE INTO (M1-M4), and lineage/metrics tables backing
checkpoint-resume (north rule)."""
