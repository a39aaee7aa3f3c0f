"""Host-side I/O: spec files, likelihood data, checkpoints."""
