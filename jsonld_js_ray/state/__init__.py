"""Checkpoint manifests, per-partition lineage, resume logic."""
