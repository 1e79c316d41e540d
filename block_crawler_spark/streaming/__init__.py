"""Incremental (tail) ingestion."""
