"""Reusable map_batches stages (validation, dedup, ANN, multimodal)."""
