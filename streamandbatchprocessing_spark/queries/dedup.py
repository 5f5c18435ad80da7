"""Deduplication queries over the documents table (filled in next)."""
