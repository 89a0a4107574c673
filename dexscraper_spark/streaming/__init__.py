"""Structured Streaming wrap (SURVEY §2.9 R1-R8)."""
