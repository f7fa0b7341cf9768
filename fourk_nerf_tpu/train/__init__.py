"""Training subsystem: optimizer, losses, drivers, checkpointing."""
