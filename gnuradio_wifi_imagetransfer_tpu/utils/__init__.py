"""Utilities: image patchization, metrics, datasets, profiling."""
