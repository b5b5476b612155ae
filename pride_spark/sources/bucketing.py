"""Bucketed tables: shuffle-free co-located joins for repeated big joins.

At 100 TB the PSM↔spectrum join (SURVEY §2.4 J5) and the index↔cluster
join (§3.2) hit the same fact tables on the same keys pipeline after
pipeline.  Writing both sides bucketed by the join key makes every later
join exchange-free: Spark reads matching buckets pairwise, so the only
cost is the scan.  The reference approximates this with its per-assay
file layout (one JSON per assay, ``PrideAnalysisAssayService``); bucketed
tables are the engine-level generalization.

Local caveat: bucketed writes go through ``saveAsTable`` (the bucket
metadata lives in the catalog), so callers pick the database/table name;
``spark.sql.sources.bucketing.enabled`` is on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``sort_cols`` additionally sorts within each bucket file, upgrading
    later merge joins to zero-sort as well as zero-shuffle.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata flows into the physical plan."""
    return spark.table(table)
