"""Jittable log-density and transform ops (the TPU compute path)."""
