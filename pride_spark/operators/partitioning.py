"""Shared partitioning helpers.

:func:`widen` is guide §2.5's "input skew: repartition immediately after
the read", used by the ANN operators (``operators/similarity.py``) and
the bench registry's ``_tw`` reads.  It lived in ``similarity.py`` as a
private helper through r13; promoted here because the registry imported
the underscore name across modules (r13 ADVICE item).
"""

from __future__ import annotations

from py4j.protocol import Py4JError
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame


def widen(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism
    when the input has FEWER partitions (r13 optimization round).

    The candidate-scoring stages of the ANN family are CPU-bound per
    pair (a ``dim``-wide double fold, or ``m`` LUT lookups), and Spark
    fuses them into the candidate side's scan stage when the probe side
    is broadcast — so a small or single-row-group parquet input pins the
    WHOLE scoring pass to its scan partition count (measured at sf0.1:
    the embeddings table is one file, one row group → one task does all
    500k pair cosines; ``spark.sql.files.minPartitionNum`` cannot help
    because a row group is the parquet split atom).  This is guide §2.5
    "input skew: repartition immediately after the read", guarded to be
    a PLAN NO-OP whenever the input is already at least default-parallel
    — at production scale the scan has thousands of partitions and the
    guard never fires, so no shuffle is added where data is big.  The
    keyless repartition round-robins (deterministic under retry via
    Spark's sort-before-repartition default).

    ``parts``: the input's partition count when the caller already knows
    it (e.g. a memoized per-table probe) — skips ``df.rdd``, which
    forces full analysis and RDD conversion of the plan at BUILD time
    (non-trivial for computed inputs like ``pq_topk``'s codes frame).
    """
    try:
        if parts is None:
            parts = df.rdd.getNumPartitions()
        want = df.sparkSession.sparkContext.defaultParallelism
    except (AnalysisException, Py4JError, AttributeError):
        # planning quirk — never fail the query for a hint
        return df
    return df.repartition(want) if parts < want else df
