"""Placeholder — filled in by the quality/pipeline build task."""
