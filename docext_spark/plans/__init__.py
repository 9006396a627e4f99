"""End-to-end pipelines and lineage emission."""
