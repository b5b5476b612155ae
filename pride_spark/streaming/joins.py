"""Stream-stream and stream-static joins over the events table.

Batch/stream-agnostic like ``events.py``: the same function body serves
``spark.read`` (the oracle) and ``spark.readStream`` (the production
path); watermarks and the time-range join condition are what make the
streaming state store bounded.

Scale notes: a stream-stream inner join keeps both sides in state until
the watermark plus the join range expires them — the ``interval`` bound
below is the knob that keeps state O(rate × horizon) instead of
unbounded.  The stream-static enrichment broadcast-joins a dimension
snapshot per micro-batch (no state at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_event_pairs(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "30 minutes",
    watermark: str = "1 hour",
    streaming: bool = True,
) -> DataFrame:
    """Per-user correlation: each ``left_type`` event joined to the
    ``right_type`` events of the same user within ``[0, within]`` after it.

    The equi-key (``user_id``) bounds the shuffle; the time-range
    predicate bounds streaming state — both sides are dropped from the
    state store once the watermark passes their join horizon.  Output:
    one row per (trigger, outcome) pair with the latency between them.
    """
    a = left.filter(F.col("event_type") == left_type).select(
        F.col("user_id").alias("uid"),
        F.col("ts").alias("trigger_ts"),
        F.col("event_id").alias("trigger_id"),
    )
    b = right.filter(F.col("event_type") == right_type).select(
        F.col("user_id").alias("uid_r"),
        F.col("ts").alias("outcome_ts"),
        F.col("event_id").alias("outcome_id"),
    )
    if streaming:
        a = a.withWatermark("trigger_ts", watermark)
        b = b.withWatermark("outcome_ts", watermark)
    joined = a.join(
        b,
        (F.col("uid") == F.col("uid_r"))
        & (F.col("outcome_ts") >= F.col("trigger_ts"))
        & (F.col("outcome_ts") <= F.col("trigger_ts") + F.expr(f"INTERVAL {within}")),
    )
    return joined.select(
        F.col("uid").alias("user_id"),
        "trigger_id",
        "outcome_id",
        # timestampdiff works on TIMESTAMP and TIMESTAMP_NTZ alike — the
        # events parquet surfaces as NTZ (isAdjustedToUTC=false), where
        # unix_micros would fail analysis.
        F.expr("timestampdiff(MICROSECOND, trigger_ts, outcome_ts)").alias("latency_us"),
    )


def enrich_with_dimension(events: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static broadcast enrichment: the static side is re-read per
    micro-batch (picks up dimension updates), never held in state."""
    return events.join(F.broadcast(dim), key, "left")
