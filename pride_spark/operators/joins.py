"""Join operators (SURVEY §2.4 J1–J10).

The two non-equi shapes are the containment theta joins (J1/J2) — broadcast
nested-loop over tiny dimensions — and the left-semi membership join (J7).
The workhorse J5 equi-join is left to Catalyst/AQE (sort-merge with skew
splitting); helpers here add the deterministic first-match semantics and the
positional-zip join the reference does imperatively.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def contains_first_match(
    probe: DataFrame,
    dim: DataFrame,
    probe_text: str,
    dim_text: str,
    probe_keys: Sequence[str],
    order_cols: Sequence[str],
    how: str = "inner",
    block_lengths: Sequence[int] | None = None,
) -> DataFrame:
    """J1/J2 — theta join ``dim.text CONTAINS probe.text`` keeping the first match.

    Ref: PrideAnalysisAssayService.java:408-413 (result file ↔ project files,
    case-insensitive containment, ``findFirst``) and :906-924 (J2).  The dim
    side is broadcast (file listings are tiny) so the nested-loop never
    shuffles the probe side; "first" is made deterministic with an explicit
    ``row_number`` over ``order_cols`` per probe row (``probe_keys``) instead
    of iteration order.

    Scale path: when every probe string has a known length (``block_lengths``),
    the dim side is exploded into all substrings of those lengths and the
    containment becomes an equi-join — O(dim·len) keys instead of an
    O(probe·dim) nested loop.  Same result set (substring match ⇔ contains).
    """
    if block_lengths:

        def sub_at(length: int):
            # single-arg closure: a 2-arg lambda would receive (element, index)
            def f(i: Column) -> Column:
                return F.lower(dim[dim_text]).substr(i, F.lit(length))

            return f

        subs = []
        for L in block_lengths:
            subs.append(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.length(F.lower(dim[dim_text])) - F.lit(L - 1), F.lit(0)),
                    ),
                    sub_at(L),
                )
            )
        exploded = dim.withColumn(
            "__sub", F.explode(F.array_distinct(F.flatten(F.array(*subs))))
        )
        joined = probe.join(exploded, F.lower(probe[probe_text]) == exploded["__sub"], how)
        joined = joined.drop("__sub").dropDuplicates(
            [*probe_keys, *order_cols]
        )
    else:
        cond = F.lower(dim[dim_text]).contains(F.lower(probe[probe_text]))
        joined = probe.join(F.broadcast(dim), cond, how)
    w = Window.partitionBy(*[probe[k] for k in probe_keys]).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return joined.withColumn("__rn", F.row_number().over(w)).filter("__rn = 1").drop("__rn")


def psm_spectrum_join(
    psms: DataFrame,
    spectra: DataFrame,
    on: Sequence[str] = ("fileName", "spectrumKey"),
    how: str = "inner",
) -> DataFrame:
    """J5 — the big PSM ↔ raw-spectrum equi-join.

    Ref: orchestrated per-PSM point reads at
    PrideAnalysisAssayService.java:545-553; here it is one shuffle join on
    (fileName, spectrumKey) with AQE skew handling.  ``spectrumKey`` is the
    normalized id produced at ingest (spectrum-id repair C9/S7 happens once,
    not per lookup).
    """
    return psms.join(spectra, list(on), how)


#: dtypes whose cast-to-double preserves ordering (bucketable lead keys)
_ORDERED_NUMERIC = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "date", "timestamp", "timestamp_ntz",
}


def global_row_index(
    df: DataFrame,
    order_cols_names: Sequence[str],
    index_name: str = "__pos",
    num_range_partitions: int | None = None,
) -> DataFrame:
    """0-based global row number in the total order of ``order_cols_names``
    — the two-pass distributed form (same shape as
    ``fdr._global_two_pass``): value-derived range buckets from approx
    quantiles of the leading order key (ties share a bucket, so bucketing
    is a pure value function — stable under AQE), per-bucket counts
    collected to the driver, broadcast prefix offsets, then a per-bucket
    ``row_number`` window.  Nothing funnels through a single task.  The
    input is scanned twice plus a column-pruned quantile pass; the bucket
    expression is deterministic, so no persist is required for
    correctness.

    Falls back to the single-partition global window only when the leading
    order column is not numeric/temporal (order-preserving bucket keys need
    a cast-to-double) — acceptable for the bounded per-file PRIDE use, and
    the caller can pre-map such keys to a numeric surrogate.

    ``order_cols_names`` must be a TOTAL order (include a unique
    tie-breaker) or the assigned indices are shuffle-dependent.
    """
    left = df
    left_order = order_cols_names
    spark = left.sparkSession
    n = num_range_partitions or spark.sparkContext.defaultParallelism
    lead = left_order[0]
    lead_type = dict(left.dtypes).get(lead, "")
    bucketable = lead_type in _ORDERED_NUMERIC or lead_type.startswith("decimal")
    order_cols = [F.col(c) for c in left_order]
    if n > 1 and bucketable:
        # date/timestamp_ntz cannot cast straight to double; route them
        # through timestamp (epoch seconds) — order-preserving either way
        zkey = (
            F.col(lead).cast("timestamp").cast("double")
            if lead_type in ("date", "timestamp_ntz")
            else F.col(lead).cast("double")
        )
        keyed = left.withColumn("__zkey", zkey)
        qs = [i / n for i in range(1, n)]
        # loose relativeError: boundaries only balance load, never values
        bounds = sorted(set(keyed.stat.approxQuantile("__zkey", qs, 0.05))) if qs else []
        if bounds:
            # plain comparison sum, not a HOF lambda: lambda captures of
            # outer attributes break self-join attribute deduplication
            nonnull = sum(
                ((F.col("__zkey") > F.lit(b)).cast("int") for b in bounds), F.lit(0)
            )
            # null lead keys sort first under Spark's asc ordering → bucket -1
            bucket = F.when(F.col("__zkey").isNull(), F.lit(-1)).otherwise(nonnull)
        else:
            bucket = F.lit(0)
        part = keyed.withColumn("__zb", bucket)
        counts = {
            r["__zb"]: r["c"]
            for r in part.groupBy("__zb").agg(F.count("*").alias("c")).collect()
        }
        offsets, cum = [], 0
        for b in sorted(counts):
            offsets.append((b, cum))
            cum += counts[b]
        off = spark.createDataFrame(offsets, "__zb int, __zoff long")
        w = Window.partitionBy("__zb").orderBy(*order_cols)
        indexed = (
            part.join(F.broadcast(off), "__zb")
            .withColumn(index_name, F.row_number().over(w) - 1 + F.col("__zoff"))
            .drop("__zkey", "__zb", "__zoff")
        )
    else:
        w = Window.orderBy(*order_cols)
        indexed = left.withColumn(index_name, F.row_number().over(w) - 1)
    return indexed


def positional_zip_join(
    left: DataFrame,
    right: DataFrame,
    left_order: Sequence[str],
    right_index_col: str,
    index_name: str = "__pos",
    num_range_partitions: int | None = None,
) -> DataFrame:
    """J8 — join the i-th row (in a declared order) of ``left`` to
    ``right.right_index_col == i`` (0-based).

    Ref: InferenceService.java:99-111 zips JSON-line order against the
    MaraCluster ``spectrumIndex``.  The index comes from
    :func:`global_row_index` (two-pass distributed row numbering — no
    single-task sort).
    """
    indexed = global_row_index(left, left_order, index_name, num_range_partitions)
    return indexed.join(right, indexed[index_name] == right[right_index_col], "inner")


def semi_join_members(
    facts: DataFrame, members: DataFrame, fact_key: str, member_key: str
) -> DataFrame:
    """J7 — keep fact rows whose key appears in the membership set.

    Ref: PrideAnalysisAssayService.java:926-936 (protein accession ∈ report
    protein accessions, used at :786).
    """
    return facts.join(
        members.select(F.col(member_key).alias(fact_key)).distinct(), fact_key, "left_semi"
    )


def broadcast_props_join(
    facts: DataFrame,
    props: DataFrame,
    key: str,
    props_col: str,
    fallback: Column,
    out_col: str = "sampleProperties",
) -> DataFrame:
    """J6 — per-file sample properties with project-level fallback.

    Ref: PrideAnalysisAssayService.java:574-579 (join), :359-385 (fallback).
    """
    return facts.join(F.broadcast(props), key, "left").withColumn(
        out_col, F.coalesce(F.col(props_col), fallback)
    )


class SpectraRelationError(ValueError):
    """J3 cardinality assertion failed (unmatched SpectraData refs)."""


def relate_spectra_files(
    spectra_data: DataFrame,
    user_files: DataFrame,
    ref_name_col: str = "location",
    file_name_col: str = "fileName",
) -> DataFrame:
    """J3 — SpectraData refs ↔ user-supplied spectra paths.

    Equality on the decompressed, case-folded basename; every SpectraData
    ref MUST find exactly one file or the assay aborts
    (ref: PrideAnalysisAssayService.java:867-896, cardinality assertion at
    :892-894).  One distributed aggregate performs the check.
    """
    from pride_spark.functions.strings import file_name_no_extension

    refs = spectra_data.withColumn(
        "__key", F.lower(file_name_no_extension(F.col(ref_name_col)))
    )
    files = user_files.withColumn(
        "__key", F.lower(file_name_no_extension(F.col(file_name_col)))
    )
    joined = refs.join(files, "__key", "left")
    bad = (
        joined.groupBy("__key")
        .agg(F.sum(F.when(F.col(file_name_col).isNull(), 1).otherwise(0)).alias("missing"))
        .filter(F.col("missing") > 0)
        .limit(5)
        .collect()
    )
    if bad:
        missing = ", ".join(r["__key"] for r in bad)
        raise SpectraRelationError(f"SpectraData refs with no matching spectra file: {missing}")
    return joined.drop("__key")
