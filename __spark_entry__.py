"""Driver contract for the pride_spark engine.

``entry(spark)`` runs the flagship FDR/q-value pipeline (the reference's
core Stage-1 computation, SURVEY §2.6) on sf0.001.  ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY §2 via
``pride_spark.registry`` — each Spark query calls the production operator
in ``pride_spark.operators``/``pride_spark.functions``, and each oracle is
the equivalent DuckDB SQL on the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pride_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.queries()["q03_fdr_qvalue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
