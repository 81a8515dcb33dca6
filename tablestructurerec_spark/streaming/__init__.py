"""Structured-Streaming faces of the extraction pipeline."""
