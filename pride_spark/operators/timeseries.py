"""Hypertable rollup — multi-resolution time-bucket aggregation (the
TimescaleDB continuous-aggregate shape; one of the brief's named custom
operators alongside the as-of and range joins).

Given an event frame and a resolution ladder (e.g. hour → day → total),
produce one aggregated row per bucket AT EVERY RESOLUTION, labeled by
level.

Scale design — cascading re-aggregation, NOT grouping sets:

Spark's native ``df.rollup(day, hour)`` / ``GROUPING SETS`` plans an
``Expand`` that replicates every INPUT row once per grouping set — at
100 TB that is a 3× read amplification through the first shuffle.  Here
the raw data is aggregated ONCE at the finest resolution (one shuffle,
map-side partial aggregation), and each coarser level re-aggregates the
PREVIOUS level's output — hours→days touches |hours| rows, not |events|;
the total row folds |days| rows.  This works because the supported
aggregate functions are all re-aggregatable:

    count  →  sum of partial counts
    sum    →  sum of partial sums   (decimal internally: exact, so the
              cascade is bit-identical to a direct per-level aggregate)
    min/max → min/max of partial min/max

Each cascade step after the first is a shuffle over an already-tiny
frame, so the whole ladder costs one big exchange + k trivial ones.
This is also the IDEMPOTENT-REFRESH shape: a production hypertable
persists the finest level partitioned by bucket and recomputes coarser
levels from it on append, never re-reading raw events.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: supported resolutions, finest-first order
_RES_ORDER = ["minute", "hour", "day", "week", "month", "quarter", "year"]


def time_bucket(ts: Column | str, resolution: str) -> Column:
    """Truncate a timestamp column to its bucket start (``date_trunc``
    semantics; works for TIMESTAMP and TIMESTAMP_NTZ alike)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_trunc(resolution, c)


class AggSpec:
    """One re-aggregatable measure: ``fn`` over ``col``, surfaced as
    ``alias``.  ``fn`` ∈ {count, sum, min, max}; for ``count`` the column
    is ignored (COUNT(*)).  ``sum`` accumulates as ``decimal(28,6)``
    internally so the cascade is order-independent and exactly equal to
    a direct aggregate; the output is cast back to double."""

    def __init__(self, fn: str, col: str | Column | None, alias: str):
        if fn not in ("count", "sum", "min", "max"):
            raise ValueError(f"unsupported aggregate {fn!r}")
        self.fn = fn
        self.col = col
        self.alias = alias

    def first_level(self) -> Column:
        if self.fn == "count":
            return F.count(F.lit(1)).alias(self.alias)
        c = F.col(self.col) if isinstance(self.col, str) else self.col
        if self.fn == "sum":
            return F.sum(c.cast("decimal(28,6)")).alias(self.alias)
        return getattr(F, self.fn)(c).alias(self.alias)

    def reagg(self) -> Column:
        src = F.col(self.alias)
        fn = "sum" if self.fn == "count" else self.fn
        return getattr(F, fn)(src).alias(self.alias)

    def finish(self) -> Column:
        if self.fn == "sum":
            return F.col(self.alias).cast("double").alias(self.alias)
        return F.col(self.alias)


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: Sequence[AggSpec],
    resolutions: Sequence[str] = ("hour", "day"),
    *,
    grand_total: bool = True,
    by: Sequence[str] | None = None,
    level_col: str = "level",
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Aggregate ``df`` at every resolution in ``resolutions`` (finest
    first), plus an optional grand-total row, via the cascade described
    in the module docstring.  Optional ``by`` keys (e.g. a tenant or
    event-type dimension) ride every level; the grand total keeps them
    (total per key), so pass ``by=None`` for a whole-table total.

    Output: ``by… , level, bucket_start, <agg aliases…>`` — one row per
    (by, bucket) per level; the total row has NULL ``bucket_start``.
    """
    res = list(resolutions)
    order = [r for r in _RES_ORDER if r in res]
    if set(order) != set(res):
        bad = set(res) - set(_RES_ORDER)
        raise ValueError(f"unknown resolutions {sorted(bad)}")
    by = list(by or [])

    finest = order[0]
    cur = (
        df.groupBy(*by, time_bucket(ts_col, finest).alias(bucket_col))
        .agg(*[a.first_level() for a in aggs])
        .withColumn(level_col, F.lit(finest))
    )
    levels = [cur]
    for r in order[1:]:
        cur = (
            cur.groupBy(*by, time_bucket(bucket_col, r).alias(bucket_col))
            .agg(*[a.reagg() for a in aggs])
            .withColumn(level_col, F.lit(r))
        )
        levels.append(cur)
    if grand_total:
        total = (
            cur.groupBy(*by)
            .agg(*[a.reagg() for a in aggs])
            .withColumn(bucket_col, F.lit(None).cast(dict(cur.dtypes)[bucket_col]))
            .withColumn(level_col, F.lit("total"))
        )
        levels.append(total)

    out_cols = [*by, level_col, bucket_col, *[a.alias for a in aggs]]
    final = [F.col(c) for c in [*by, level_col, bucket_col]] + [a.finish() for a in aggs]
    parts = [lv.select(*out_cols).select(*final) for lv in levels]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
