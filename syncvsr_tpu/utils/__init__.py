"""Utilities: metrics, checkpointing, logging."""
