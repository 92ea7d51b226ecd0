"""Batch readers/writers and connector-side parsing (SURVEY §2.1)."""
