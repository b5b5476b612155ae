"""Relational operators of the engine (SURVEY §2.3–§2.9 + north-star extensions)."""
