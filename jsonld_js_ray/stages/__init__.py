"""Ray Data stages: batch transforms and actor pools for the KG pipeline."""
