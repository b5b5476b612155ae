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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: working-column name for the monotone fine bucket (see fine_bucket_sql)
FINE = "__fine_bucket"


def fine_bucket_sql(key: str) -> str:
    """Monotone integer fine-bucket of a double column rendered as SQL —
    the one-pass replacement for an approxQuantile probe (r14, r13-verdict
    task #4) used by the two-pass global operators (FDR, global row
    index, keyless as-of join).

    Maps every double to a LONG such that (1) the map is monotone
    non-decreasing under Spark's double ordering (-Inf < finite < +Inf <
    NaN, with -0.0 = 0.0), so fine-bucket ranges are order-contiguous in
    the key, and (2) the distinct-value count is bounded (~90 buckets
    per decade x ~600 decades worst case; tens to hundreds on real
    distributions), so ONE ``groupBy(fine)`` aggregation yields both the
    load-balancing boundaries AND any exact per-range totals that
    previously took a second driver job after the quantile probe.

    Construction for finite non-zero x: ``d = clamp(floor(log10(|x|)),
    -300, 305)`` (``java.lang.Math.log10`` is documented semi-monotonic,
    so ``d`` is monotone in |x| even where 1-ulp error shifts it off the
    true decade), then ``r = floor(|x| * 10^(1-d))`` — monotone within a
    ``d``-class because the per-class scale is a FIXED literal — packed
    as ``(d + 400) * 100000 + min(r, 99999)``, negated for x < 0.  An
    off-by-one ``d`` only widens ``r``'s range ([1, 1000) instead of
    [10, 100)); the pack slot holds the top-clamp worst case (~18000).
    Zeros, infinities and NaN take fixed sentinels ordered consistently;
    NULL keys map to NULL (callers route them to their null bucket).
    Exactness matters only for MONOTONICITY and driver/executor
    agreement — both compare the resulting longs — never for boundary
    placement, which (like the quantile probe this replaces) only
    balances load.  Pinned by test_fdr.py's adversarial-doubles
    monotonicity property.
    """
    inv = ", ".join(f"{10.0 ** (1 - d)!r}D" for d in range(-300, 306))
    a = f"abs({key})"
    d = f"CAST(least(greatest(floor(log10({a})), -300L), 305L) AS INT)"
    r = f"least(CAST(floor({a} * element_at(array({inv}), {d} + 301)) AS BIGINT), 99999L)"
    fp = f"(CAST({d} + 400 AS BIGINT) * 100000L + {r})"
    return (
        f"CASE WHEN isnan({key}) THEN 900000000L "
        f"WHEN {key} = CAST('Infinity' AS DOUBLE) THEN 800000000L "
        f"WHEN {key} = CAST('-Infinity' AS DOUBLE) THEN -800000000L "
        f"WHEN {key} = 0.0D THEN 0L "
        f"WHEN {key} > 0.0D THEN {fp} ELSE -{fp} END"
    )


def fine_histogram_partition(
    fined: DataFrame, n: int, aggs: list[Column]
) -> tuple[list[dict], Column]:
    """Drive the fused probe: ONE aggregation over ``fined[FINE]``
    (built with :func:`fine_bucket_sql`) that yields load-balancing
    splits AND per-fine aggregate values in a single driver job.

    Returns ``(hist, chain)``: ``hist`` is one dict per observed fine
    value — ``{"fine", "pid", "c", ...caller agg aliases}`` sorted by
    fine with a NULL-fine entry (rows whose key is NULL) FIRST under
    ``pid = -1``; ``chain`` is the bucket Column for non-null keys
    (``#splits strictly below fine`` as a sum-of-indicator chain —
    deliberately NOT a filter() HOF, whose single-reference lambda would
    let CollapseProject inline the whole fine expression and re-evaluate
    it per split element, interpreted; measured 0.15 → 3.4 s on the q03
    minima pass).  Greedy equal-count splitting over ``c``; driver and
    executor agree by exact long comparison (``s < fine``), so there are
    no float boundary subtleties.  At most ``n`` buckets.
    """
    rows = sorted(
        fined.groupBy(FINE).agg(F.count(F.lit(1)).alias("__c"), *aggs).collect(),
        key=lambda r: (r[FINE] is not None, r[FINE] if r[FINE] is not None else 0),
    )
    nonnull = [r for r in rows if r[FINE] is not None]
    total = sum(r["__c"] for r in nonnull)
    goal = max(total / n, 1.0) if nonnull else 1.0
    splits: list[int] = []
    hist: list[dict] = []
    run_c, run_pid = 0, 0
    for r in rows:
        if r[FINE] is None:
            hist.append({"fine": None, "pid": -1, "c": r["__c"], **{
                k: r[k] for k in r.asDict() if k not in (FINE, "__c")}})
            continue
        hist.append({"fine": r[FINE], "pid": run_pid, "c": r["__c"], **{
            k: r[k] for k in r.asDict() if k not in (FINE, "__c")}})
        run_c += r["__c"]
        if run_c >= goal * (len(splits) + 1) and len(splits) < n - 1:
            splits.append(r[FINE])
            run_pid += 1
    if splits:
        chain = F.expr(
            " + ".join(f"CAST({FINE} > {s}L AS INT)" for s in splits)
        )
    else:
        chain = F.lit(0)
    return hist, chain


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
