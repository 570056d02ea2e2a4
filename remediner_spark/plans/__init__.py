"""Pipeline assembly and resumable checkpointing."""
