"""End-to-end pipelines: dedup (flagship), clustering, query registry."""
