"""Structured Streaming queries (filled in next)."""
