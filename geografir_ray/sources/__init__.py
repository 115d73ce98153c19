"""Readers (column-pruned parquet) + deterministic synthetic tables."""
