"""Lineage, checkpoint/resume, and provenance state."""
