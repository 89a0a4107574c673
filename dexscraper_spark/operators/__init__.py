"""Relational operators (SURVEY §2.4-2.9), all pure DataFrame plans."""
