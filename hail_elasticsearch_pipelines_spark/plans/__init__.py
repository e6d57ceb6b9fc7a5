"""Staged pipeline runner: checkpoints, lineage, metrics, sizing."""
