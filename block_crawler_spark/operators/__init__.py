"""Dataflow operators re-expressed as DataFrame transformations."""
