"""Serialization: streaming container formats + checkpointing."""
