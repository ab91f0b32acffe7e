"""Placeholder — filled in by the corresponding build task."""
