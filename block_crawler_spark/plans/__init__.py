"""End-to-end query plans."""
