"""Host-side utilities: rendering, IO, checkpointing, timing, progress."""
