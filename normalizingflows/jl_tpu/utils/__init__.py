"""Utilities: pytree module system, checkpointing, metrics."""
