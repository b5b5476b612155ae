"""Sink writers (SURVEY §2.2 K1–K7)."""
