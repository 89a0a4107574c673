"""Sink/export surface (SURVEY §2.2 K1-K11)."""
