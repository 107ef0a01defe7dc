"""End-to-end pipelines (lazy Ray Data graphs; Ray init is the caller's)."""
