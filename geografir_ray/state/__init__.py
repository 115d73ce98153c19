"""Storage locations, checkpoint/lineage, and broadcast helpers."""
