"""Structured Streaming surface (SURVEY §2.12 — additive extension).

The reference is strictly batch; this package is the engine's incremental
path over the same logical tables (the driver's ``events`` fixture).
Every transformation here is expressed so the SAME code runs in batch
(``spark.read``) and streaming (``spark.readStream``) — the Spark
unified-API contract.
"""
