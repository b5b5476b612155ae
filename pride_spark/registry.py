"""Query registry: every implemented operator from SURVEY §2, exercised on
the driver's synthetic tables, each paired with a DuckDB oracle SQL string.

Design rule: the Spark side of each query calls the REAL package operator
(``pride_spark.operators.*`` / ``pride_spark.functions.*``) with the
TPC-H-ish columns mapped onto its domain parameters — so the correctness
gate checks production code paths, not query-local reimplementations.

Numeric-parity rules (so value hashes match DuckDB bit-for-bit):
- sums of doubles go through ``DECIMAL(18,6)`` (order-independent exact
  arithmetic in both engines), then cast back to double;
- integer/integer divisions stay raw (IEEE-deterministic);
- float-fold results (cosine, mass sums) are rounded to 5–6 dp;
- DuckDB regexps are RE2: oracles use lookahead-free equivalents.
"""

from __future__ import annotations

import os as _os
import time as _time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pride_spark.functions.mass import missed_cleavages, theoretical_mass
from pride_spark.functions.strings import (
    capitalize,
    clean_usi_special_chars,
    file_name_no_extension,
    make_isobaric,
    remove_charge_state,
)
from pride_spark.functions.usi import build_usi, spectra_usi
from pride_spark.functions.spectrum_id import normalize_spectrum_id
from pride_spark.operators import cluster as cluster_ops
from pride_spark.operators import dedup, inference, similarity, text
from pride_spark.operators.fdr import add_fdr_qvalue, repair_zero_qvalues, top_n_per_spectrum
from pride_spark.operators.partitioning import widen as _widen
from pride_spark.sinks.mgf import mgf_record
from pride_spark.operators.joins import contains_first_match, positional_zip_join, semi_join_members
from pride_spark.operators.rollup import distinguishable_categories, protein_rollup
from pride_spark import session as _session
from pride_spark.session import register_pinned, tune

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_fn, oracle_sql | lazy thunk | None).  A CALLABLE oracle
#: is resolved (and memoized) only when :func:`oracle_sql` is consumed —
#: so an oracle whose text depends on training data (q43's trained-PQ
#: codebooks) costs nothing at import time and never fails module import
#: on a machine without the training fixture.
_REGISTRY: dict[str, tuple[QueryFn, "str | Callable[[], str] | None"]] = {}


def register(name: str, oracle: "str | Callable[[], str] | None"):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def bench_fixtures() -> "dict[str, QueryFn]":
    """One-time BUILD-stage work some registry queries share, exposed so
    bench.py can run (and time) it before the battery: q43's timed row
    then measures the four ANN searches, with index build + codebook
    training reported as its own line.  Each callable is idempotent —
    running it twice is a memo hit."""
    def _q43(spark: SparkSession, sf_dir: str):
        q43_build_artifacts(spark, sf_dir)

    def _q45(spark: SparkSession, sf_dir: str):
        q45_sets_path(spark, sf_dir)

    return {"q43_ann_build": _q43, "q45_sets_build": _q45}


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for k, (fn, orc) in _REGISTRY.items():
        if orc is None:
            continue
        if callable(orc):
            orc = orc()
            _REGISTRY[k] = (fn, orc)  # memoize the resolved text
        out[k] = orc
    return out


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``_t`` + guarded round-robin widen (r13) — for queries whose heavy
    per-row work (formatting, regex, in-row regroups, per-row hashing)
    would otherwise FUSE into the scan stage: the bench corpus tables
    are single-file, single-row-group parquet, and a row group is the
    parquet split atom, so such a stage runs on ONE core no matter the
    session's parallelism.  ``_widen`` is guide §2.5's "repartition
    immediately after the read", a plan no-op whenever the scan already
    has >= default-parallelism partitions (any real deployment).
    Deliberately NOT applied to every query: a blanket widen in ``_t``
    was measured (full battery at sf0.1) to cost +0.1-1.3 s per query
    on the shuffle-light rows — the extra exchange outweighs
    parallelism wherever per-row work is trivial or the first real
    operator exchanges anyway — while the CPU-bound narrow rows gained
    1.3-2x; only the measured winners opt in.

    The scan's partition count is memoized per (dir, table,
    parallelism): it is plan METADATA (file splits — stable for a given
    table and session parallelism, never row data), and the probe
    (``df.rdd.getNumPartitions()``) forces a full plan analysis + RDD
    conversion per call (r13 ADVICE item)."""
    df = _t(spark, sf_dir, name)
    key = (sf_dir, name, spark.sparkContext.defaultParallelism)
    if key not in _TW_PARTS:
        _TW_PARTS[key] = df.rdd.getNumPartitions()
    return _widen(df, parts=_TW_PARTS[key])


#: (sf_dir, table, defaultParallelism) -> scan partition count (see _tw)
_TW_PARTS: dict[tuple, int] = {}


def _dsum(col) -> F.Column:
    """Order-independent exact sum of a double column (via decimal)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,6)")).cast("double")


# SQL fragment mirroring _dsum
def _dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"



def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with the TIMESTAMP(NANOS) column converted to micros.

    Spark reads parquet nano timestamps only as long (nanosAsLong); the
    conversion uses integer ``div`` so no double-precision loss occurs.
    """
    ev = _t(spark, sf_dir, "events")
    if dict(ev.dtypes).get("ts") == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev

# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.6 A1/A8/A14) — pricing rollup with map-side combine.
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_rollup",
    f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           {_dsum_sql('l_extendedprice')} AS sum_base_price,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Filter stack (SURVEY §2.3 F5–F9 shape): conjunctive predicates, pushed to scan.
# ---------------------------------------------------------------------------
@register(
    "q02_filter_stack",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_quantity >= 30 AND l_discount BETWEEN 0.02 AND 0.08
      AND l_returnflag <> 'A' AND l_shipdate >= TIMESTAMP '1997-01-01'
    """,
)
def q02_filter_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30)
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_returnflag") != "A")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")


# ---------------------------------------------------------------------------
# FDR / q-value windows (SURVEY §2.6 ⚙, §2.7) — THE flagship operator, run on
# orders with o_orderstatus='F' as the decoy flag; scalable two-pass path.
# ---------------------------------------------------------------------------
@register(
    "q03_fdr_qvalue",
    """
    WITH scored AS (
      SELECT o_orderkey, o_totalprice AS score, (o_orderstatus = 'F') AS is_decoy
      FROM orders
    ), cume AS (
      SELECT o_orderkey, score, is_decoy,
        SUM(CASE WHEN is_decoy THEN 1 ELSE 0 END)
          OVER (ORDER BY score DESC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd,
        SUM(CASE WHEN is_decoy THEN 0 ELSE 1 END)
          OVER (ORDER BY score DESC RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
      FROM scored
    ), f AS (
      SELECT o_orderkey, score, is_decoy, cd / GREATEST(ct, 1) AS fdr FROM cume
    ), q AS (
      SELECT o_orderkey, is_decoy, fdr,
        MIN(fdr) OVER (ORDER BY score DESC RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS qvalue
      FROM f
    ), rep AS (
      SELECT MIN(qvalue) FILTER (WHERE qvalue > 0) AS minq FROM q
    )
    SELECT o_orderkey, is_decoy AS isDecoy, fdr,
           CASE WHEN qvalue > 0 THEN qvalue ELSE ROUND((SELECT minq FROM rep) / 10, 6) END AS qvalue
    FROM q
    """,
)
def q03_fdr_qvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("score"),
        (F.col("o_orderstatus") == "F").alias("isDecoy"),
    )
    out = add_fdr_qvalue(o, "score", "isDecoy", better="higher", scalable=True)
    out = repair_zero_qvalues(out, "qvalue")
    return out.select("o_orderkey", "isDecoy", "fdr", "qvalue")


# ---------------------------------------------------------------------------
# Top-N per group (SURVEY §2.6 A13 / PIA top-N per spectrum).
# ---------------------------------------------------------------------------
@register(
    "q04_topn_per_group",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_extendedprice DESC, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
)
def q04_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    best = top_n_per_spectrum(
        li, n=1, spectrum_cols=("l_orderkey",), score_col="l_extendedprice",
        better="higher", tie_cols=("l_linenumber",),
    )
    return best.select("l_orderkey", "l_linenumber", "l_extendedprice")


# ---------------------------------------------------------------------------
# The big equi-join (SURVEY §2.4 J5 shape) + aggregation.
# ---------------------------------------------------------------------------
@register(
    "q05_big_join_agg",
    f"""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_orderkey) AS order_count,
           {_dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_quantity > 10
    GROUP BY o_orderpriority
    """,
)
def q05_big_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_quantity") > 10)
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Star join over broadcast dimensions (SURVEY §2.4 J4/J6/J10 shape).
# ---------------------------------------------------------------------------
@register(
    "q06_star_join",
    """
    SELECT r_name, p_type, COUNT(*) AS n, SUM(l_quantity) AS qty
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      JOIN part     ON l_partkey = p_partkey
    GROUP BY r_name, p_type
    """,
)
def q06_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    p = F.broadcast(_t(spark, sf_dir, "part"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("r_name", "p_type")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )


# ---------------------------------------------------------------------------
# Containment theta join, first match (SURVEY §2.4 J1/J2): order key padded
# to 9 digits is contained in the owning customer's name.
# ---------------------------------------------------------------------------
@register(
    "q07_theta_contains_join",
    """
    SELECT o_orderkey, c_custkey, c_name
    FROM (
      SELECT o.o_orderkey, c.c_custkey, c.c_name,
             ROW_NUMBER() OVER (PARTITION BY o.o_orderkey ORDER BY c.c_custkey) AS rn
      FROM (SELECT o_orderkey, LPAD(CAST(o_custkey AS VARCHAR), 9, '0') AS pad FROM orders) o
      JOIN customer c ON CONTAINS(LOWER(c.c_name), o.pad)
    ) WHERE rn = 1
    """,
)
def q07_theta_contains_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.lpad(F.col("o_custkey").cast("string"), 9, "0").alias("pad")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    first = contains_first_match(
        o, c, probe_text="pad", dim_text="c_name",
        probe_keys=("o_orderkey",), order_cols=("c_custkey",),
        block_lengths=[9],  # all pads are 9 chars → substring equi-join path
    )
    return first.select("o_orderkey", "c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Left-semi membership join (SURVEY §2.4 J7).
# ---------------------------------------------------------------------------
@register(
    "q08_semi_join",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """,
)
def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "lineitem")
    members = li.filter(F.col("l_quantity") >= 49)
    return semi_join_members(o, members, "o_orderkey", "l_orderkey").select(
        "o_orderkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# Left join with fallback/coalesce (SURVEY §2.4 J6 shape).
# ---------------------------------------------------------------------------
@register(
    "q09_left_join_fallback",
    f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE({_dsum_sql('o.o_totalprice')}, 0.0) AS total_spent
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q09_left_join_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(_dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# Global scalar repair (SURVEY §2.6 A2: q-value zero replacement).
# ---------------------------------------------------------------------------
@register(
    "q10_min_positive_repair",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount > 0 THEN l_discount
                ELSE ROUND((SELECT MIN(l_discount) FROM lineitem WHERE l_discount > 0) / 10, 6)
           END AS disc_repaired
    FROM lineitem
    """,
)
def q10_min_positive_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_discount").alias("disc_repaired")
    )
    return repair_zero_qvalues(li, "disc_repaired")


# ---------------------------------------------------------------------------
# Union + distinct (SURVEY §2.9).
# ---------------------------------------------------------------------------
@register(
    "q11_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q11_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# ---------------------------------------------------------------------------
# Partitioned running windows (SURVEY §2.7): per-customer cumulative spend.
# ---------------------------------------------------------------------------
@register(
    "q12_window_running",
    """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q12_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("cum_spend"),
    )


# ---------------------------------------------------------------------------
# Deduplication gate row, union-shaped (q50 fold pattern, 50-entry cap):
#
# - kind='exact'   — exact dedup by content digest (north-star; SURVEY
#   "dedup" extension): one survivor per md5(text).
# - kind='inc_dup' — INCREMENTAL near-dup (operators.curation.
#   incremental_near_dup_flags): a deterministic hash-sampled 25% "new
#   batch" LSH-banded against the remaining 75% "corpus" — the
#   new-batch×corpus join a daily ingestion pipeline runs (never a
#   self-join of the union).  The oracle mirrors the chunked-md5 minhash
#   banding exactly as q24's does, split by the same md5 hash fraction
#   the engine samples with (seed 'batch', boundary 0.25 = exact binary).
# ---------------------------------------------------------------------------
@register(
    "q13_dedup_exact",
    r"""
    WITH t AS (
      SELECT doc_id, text,
             CAST(CAST(CONCAT('0x', SUBSTR(MD5('batch|' || CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) AS DOUBLE) / 4294967296.0 < 0.25 AS is_new,
             STRING_SPLIT_REGEX(TRIM(text), '\s+') AS w
      FROM documents
    ), s AS (
      SELECT doc_id, is_new, MD5(text) AS dg,
             LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w) - 2, 1) + 1),
                            i -> ARRAY_TO_STRING(LIST_SLICE(w, i, i + 2), ' ')) AS sh
      FROM t
    ), sig AS (
      SELECT doc_id, is_new, dg, sh,
             [LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 1, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 9, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 17, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 25, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('1|' || x), 1, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('1|' || x), 9, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('1|' || x), 17, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('1|' || x), 25, 8)))] AS sg
      FROM s
    ), bd AS (
      SELECT doc_id, is_new, dg,
             LIST_TRANSFORM([0, 1, 2, 3],
               b -> MD5(ARRAY_TO_STRING(LIST_SLICE(sg, b * 2 + 1, b * 2 + 2), '|'))) AS bds
      FROM sig
    ), banded AS (
      SELECT doc_id, is_new, dg, u.band AS band, bds[u.band + 1] AS bucket, bds
      FROM bd, UNNEST([0, 1, 2, 3]) AS u(band)
    ), pairs AS (
      -- FIRST-COLLISION-WINS new-batch x corpus band join, mirroring
      -- curation.incremental_near_dup_flags
      SELECT n.doc_id AS id, n.dg AS dg_n, c.doc_id AS match_id, c.dg AS dg_c
      FROM banded n JOIN banded c
        ON n.band = c.band AND n.bucket = c.bucket AND n.is_new AND NOT c.is_new
      WHERE LIST_POSITION(LIST_TRANSFORM(RANGE(1, 5), i -> n.bds[i] = c.bds[i]), TRUE)
            = n.band + 1
    ), ver AS (
      SELECT id, match_id,
             CASE WHEN dg_n = dg_c THEN 1.0
                  ELSE ROUND(
                    CAST(LEN(LIST_FILTER(LIST_DISTINCT(sa.sh), x -> LIST_CONTAINS(sb.sh, x))) AS DOUBLE)
                    / LEN(LIST_DISTINCT(LIST_CONCAT(sa.sh, sb.sh))), 6) END AS jaccard
      FROM pairs JOIN sig sa ON pairs.id = sa.doc_id
                 JOIN sig sb ON pairs.match_id = sb.doc_id
    )
    SELECT 'exact' AS kind, MIN(doc_id) AS doc_id, CAST(NULL AS BIGINT) AS match_id,
           MD5(text) AS digest, CAST(NULL AS DOUBLE) AS jaccard
    FROM documents GROUP BY MD5(text)
    UNION ALL
    SELECT 'inc_dup' AS kind, id AS doc_id, match_id,
           CAST(NULL AS VARCHAR) AS digest, jaccard
    FROM ver WHERE jaccard >= 0.1
    """,
)
def q13_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.curation import (
        batch_signatures,
        corpus_signatures,
        hash_fraction,
        incremental_near_dup_flags,
    )

    docs = _t(spark, sf_dir, "documents")
    is_new = hash_fraction("doc_id", "batch") < 0.25
    # ONE shingle→minhash pass over the whole corpus (carrying the text
    # digest and the batch flag); both incremental sides AND the exact
    # dedup derive from this persisted narrow frame — the alternative
    # (exact_dedup + one signature pass per side) scans the text thrice.
    mh = register_pinned(
        dedup.minhash_signatures_df(
            docs, "text", "doc_id", num_hashes=8, shingle_n=3,
            carry={"dg": F.md5(F.col("text")), "is_new": is_new},
        ).persist()
    )
    exact = mh.groupBy("dg").agg(F.expr("min(id) AS doc_id")).selectExpr(
        "'exact' AS kind",
        "doc_id",
        "CAST(NULL AS BIGINT) AS match_id",
        "dg AS digest",
        "CAST(NULL AS DOUBLE) AS jaccard",
    )
    flags = incremental_near_dup_flags(
        docs.filter(is_new), docs.filter(~is_new), "text", "doc_id",
        num_hashes=8, bands=4, shingle_n=3, threshold=0.1,
        new_signatures_df=batch_signatures(
            None, "text", "doc_id", minhash_df=mh.filter("is_new").drop("is_new")
        ),
        corpus_signatures_df=corpus_signatures(
            None, "text", "doc_id", minhash_df=mh.filter(~F.col("is_new")).drop("is_new")
        ),
    )
    inc = flags.selectExpr(
        "'inc_dup' AS kind",
        "id AS doc_id",
        "match_id",
        "CAST(NULL AS STRING) AS digest",
        "jaccard",
    )
    return exact.unionByName(inc)


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex) + document fingerprint
# (Rabin–Karp polynomial rolling hash; identical fold in both engines —
# 0-init fold ≡ first-element reduce because (0*31+c) % p = c).  One gate
# row for both north-star text-analysis scalars (formerly q14 + q44) to
# stay inside the 50-entry driver cap.
# ---------------------------------------------------------------------------
@register(
    "q14_token_stats",
    r"""
    SELECT doc_id,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) END AS n_tokens,
           LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS n_bpe,
           CASE WHEN LEN(text) = 0 THEN 0 ELSE
             LIST_REDUCE(
               LIST_TRANSFORM(RANGE(1, LEN(text) + 1),
                              i -> CAST(ASCII(SUBSTR(text, i, 1)) AS BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007)
           END AS fingerprint
    FROM documents
    """,
)
def q14_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tw(spark, sf_dir, "documents")  # r13: per-row token/fingerprint exprs are scan-fused
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_tokens"),
        text.bpe_ish_token_count(F.col("text")).alias("n_bpe"),
        text.rolling_fingerprint(F.col("text")).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# USI construction + truncation + special-char cleaning (SURVEY §2.10 C2–C4).
# ---------------------------------------------------------------------------
@register(
    "q15_usi_build",
    """
    WITH u AS (
      SELECT doc_id,
             TRANSLATE(CONCAT_WS(':', 'mzspec', UPPER(source), 'doc', 'index',
                                 CAST(doc_id AS VARCHAR), lang),
                       '()_ =&$@;+?{^}%]>[~<#|', '') AS usi
      FROM documents
    )
    SELECT doc_id, usi,
           ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(usi, ':'), 1, 5), ':') AS spectra_usi
    FROM u
    """,
)
def q15_usi_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    usi = clean_usi_special_chars(
        build_usi(
            F.upper(F.col("source")),
            F.lit("doc"),
            F.lit("index"),
            F.col("doc_id").cast("string"),
            F.col("lang"),
        )
    )
    return docs.select(
        "doc_id", usi.alias("usi"), spectra_usi(usi).alias("spectra_usi")
    )


# ---------------------------------------------------------------------------
# Scalar string functions C5/C7/C8/C19 (SURVEY §2.10).
# ---------------------------------------------------------------------------
@register(
    "q16_scalar_strings",
    r"""
    SELECT p_partkey,
           TRANSLATE(UPPER(p_name), 'L', 'I') AS iso,
           REGEXP_REPLACE(CONCAT(p_brand, '/', CAST(p_size AS VARCHAR)), '/\d+$', '') AS nocharge,
           CONCAT(UPPER(SUBSTRING(p_type, 1, 1)), LOWER(SUBSTRING(p_type, 2))) AS cap,
           REGEXP_REPLACE(REGEXP_REPLACE(CONCAT(p_name, '.mzML.gz'), '\.(gz|zip)$', ''),
                          '\.[^.]*$', '') AS file_no_ext
    FROM part
    """,
)
def q16_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        make_isobaric(F.upper(F.col("p_name"))).alias("iso"),
        remove_charge_state(F.concat(F.col("p_brand"), F.lit("/"), F.col("p_size").cast("string"))).alias("nocharge"),
        capitalize(F.col("p_type")).alias("cap"),
        file_name_no_extension(F.concat(F.col("p_name"), F.lit(".mzML.gz"))).alias("file_no_ext"),
    )


# ---------------------------------------------------------------------------
# Date formatting (SURVEY §2.10 C16) + grouped agg.
# ---------------------------------------------------------------------------
@register(
    "q17_date_format",
    f"""
    SELECT STRFTIME(o_orderdate, '%Y-%m-%d') AS d,
           COUNT(*) AS n,
           {_dsum_sql('o_totalprice')} AS total
    FROM orders GROUP BY 1
    """,
)
def q17_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"))
        .agg(F.count("*").alias("n"), _dsum("o_totalprice").alias("total"))
    )


# ---------------------------------------------------------------------------
# JSON extraction (SURVEY §2.11) over the events props column.
# ---------------------------------------------------------------------------
@register(
    "q18_json_extract",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum
    FROM events GROUP BY event_type
    """,
)
def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_sum"),
    )


# ---------------------------------------------------------------------------
# Tumbling time window (batch shape of the streaming surface, SURVEY §2.12)
# + hypertable rollup (operators.timeseries.hypertable_rollup — the brief's
# named multi-resolution time-bucket operator; q50/q13 fold pattern under
# the 50-entry driver cap).  kind='window_hour' keeps the streaming-
# compatible F.window path; kind='ht_*' rows come from the CASCADING
# re-aggregation (hour from raw — the only full-data shuffle — day from
# hours, week from days, month from DAYS — not weeks: an ISO week can
# straddle a month boundary, so the cascade draws each level from the
# coarsest computed level that NESTS inside it — total from months; no
# grouping-sets Expand).  The decimal-internal sums make the cascade
# exactly equal to the oracle's direct per-level aggregates regardless
# of partitioning; the week/month rows gate the nesting rule itself.
# ---------------------------------------------------------------------------
@register(
    "q19_tumbling_window",
    f"""
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    h AS (SELECT DATE_TRUNC('hour', ts) AS b, COUNT(*) AS n,
                 {_dsum_sql('value')} AS s
          FROM e GROUP BY 1),
    d AS (SELECT DATE_TRUNC('day', ts) AS b, COUNT(*) AS n,
                 {_dsum_sql('value')} AS s
          FROM e GROUP BY 1),
    w AS (SELECT DATE_TRUNC('week', ts) AS b, COUNT(*) AS n,
                 {_dsum_sql('value')} AS s
          FROM e GROUP BY 1),
    mo AS (SELECT DATE_TRUNC('month', ts) AS b, COUNT(*) AS n,
                  {_dsum_sql('value')} AS s
           FROM e GROUP BY 1),
    t AS (SELECT COUNT(*) AS n, {_dsum_sql('value')} AS s FROM e)
    SELECT 'window_hour' AS kind, b AS bucket_start, n, s AS value_sum FROM h
    UNION ALL SELECT 'ht_hour', b, n, s FROM h
    UNION ALL SELECT 'ht_day', b, n, s FROM d
    UNION ALL SELECT 'ht_week', b, n, s FROM w
    UNION ALL SELECT 'ht_month', b, n, s FROM mo
    UNION ALL SELECT 'ht_total', NULL, n, s FROM t
    """,
)
def q19_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.timeseries import AggSpec, hypertable_rollup

    ev = _events(spark, sf_dir)
    win = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), _dsum("value").alias("value_sum"))
        .select(
            F.lit("window_hour").alias("kind"),
            F.col("w.start").alias("bucket_start"),
            "n",
            "value_sum",
        )
    )
    ht = hypertable_rollup(
        ev,
        "ts",
        [AggSpec("count", None, "n"), AggSpec("sum", "value", "value_sum")],
        resolutions=("hour", "day", "week", "month"),
    ).select(
        F.concat(F.lit("ht_"), F.col("level")).alias("kind"),
        "bucket_start",
        "n",
        "value_sum",
    )
    return win.unionByName(ht)


# ---------------------------------------------------------------------------
# Quality scoring (north-star text analysis) + deterministic hash split
# (operators.curation.hash_split — the "score, then split" curation step a
# training pipeline runs; folded into one gate row under the 50-entry
# driver cap, q50/q14 pattern).  The split label is a pure function of
# (seed, doc_id) via the first 8 hex chars of md5 — engine-reproducible,
# so DuckDB derives the identical assignment; weights are exact binary
# fractions (0.75/0.125/0.125) so the cumulative boundaries carry no
# float-accumulation ambiguity between engines.
# ---------------------------------------------------------------------------
@register(
    "q20_quality_score",
    r"""
    WITH t AS (
      SELECT doc_id, text,
             LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS n_tok,
             LENGTH(REGEXP_REPLACE(text, '\s+', '', 'g')) AS n_nospace,
             LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             LENGTH(text) AS n_char,
             CAST(CAST(CONCAT('0x', SUBSTR(MD5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) AS DOUBLE) / 4294967296.0 AS frac
      FROM documents
    )
    SELECT doc_id,
           ROUND((
             (CASE WHEN n_tok >= 10 AND n_tok <= 100000 THEN 1.0 ELSE 0.0 END) +
             (CASE WHEN n_tok > 0 AND (CAST(n_nospace AS DOUBLE)/n_tok) >= 2.0
                        AND (CAST(n_nospace AS DOUBLE)/n_tok) <= 12.0 THEN 1.0 ELSE 0.0 END) +
             (CASE WHEN n_char > 0 THEN CAST(n_alpha AS DOUBLE)/n_char ELSE 0.0 END)
           ) / 3.0, 6) AS quality,
           CASE WHEN frac < 0.75 THEN 'train'
                WHEN frac < 0.875 THEN 'valid'
                ELSE 'test' END AS split
    FROM t
    """,
)
def q20_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.curation import hash_split

    docs = _t(spark, sf_dir, "documents")
    split = hash_split(
        docs, "doc_id", {"train": 0.75, "valid": 0.125, "test": 0.125}, seed="split"
    )
    return split.select(
        "doc_id", text.quality_score(F.col("text")).alias("quality"), "split"
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic (north-star text analysis) + per-language
# stratified sampling (operators.curation.stratified_sample — the
# corpus-rebalancing step a training pipeline runs on the detected
# language; q20 fold pattern).  The sample is a pure function of
# (seed, doc_id) via the q20 md5-fraction technique, so DuckDB derives
# the identical survivor set; per-stratum rates compile to one codegen
# CASE chain inside a narrow filter — no shuffle, no per-stratum pass.
# ---------------------------------------------------------------------------
@register(
    "q21_lang_detect",
    r"""
    WITH t AS (
      SELECT doc_id, lang,
             STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+') AS toks
      FROM documents
    ), h AS (
      SELECT doc_id, lang,
        LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['der','die','und','das','ist'], x))) AS h_de,
        LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['the','a','and','of','to'], x))) AS h_en,
        LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['el','la','de','que','y'], x))) AS h_es,
        LEN(LIST_FILTER(toks, x -> LIST_CONTAINS(['le','la','et','les','des'], x))) AS h_fr
      FROM t
    ), p AS (
    SELECT doc_id, lang AS lang_claimed,
           CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
                WHEN h_de = GREATEST(h_de, h_en, h_es, h_fr) THEN 'de'
                WHEN h_en = GREATEST(h_de, h_en, h_es, h_fr) THEN 'en'
                WHEN h_es = GREATEST(h_de, h_en, h_es, h_fr) THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM h
    )
    SELECT doc_id, lang_claimed, lang_pred
    FROM p
    WHERE CAST(CAST(CONCAT('0x', SUBSTR(MD5('strat|' || CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS DOUBLE) / 4294967296.0
          < CASE lang_pred WHEN 'en' THEN 0.25 WHEN 'es' THEN 0.5
                           WHEN 'de' THEN 1.0 WHEN 'fr' THEN 1.0
                           ELSE 0.125 END
    """,
)
def q21_lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.curation import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    pred = docs.select(
        "doc_id",
        F.col("lang").alias("lang_claimed"),
        text.detect_language(F.col("text")).alias("lang_pred"),
    )
    return stratified_sample(
        pred,
        "lang_pred",
        {"en": 0.25, "es": 0.5, "de": 1.0, "fr": 1.0},
        id_col="doc_id",
        default_rate=0.125,
        seed="strat",
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k (north-star similarity baseline).
# ---------------------------------------------------------------------------
@register(
    "q22_cosine_topk",
    """
    WITH p AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 100),
    b AS (SELECT vec_id AS nbr_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
    scored AS (
      SELECT query_id, nbr_id,
             ROUND(LIST_INNER_PRODUCT(qv, nv) /
                   (SQRT(LIST_INNER_PRODUCT(qv, qv)) * SQRT(LIST_INNER_PRODUCT(nv, nv))),
                   6) AS cosine
      FROM p JOIN b ON query_id <> nbr_id
    )
    SELECT query_id, nbr_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, nbr_id) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def q22_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") < 100)
    return similarity.brute_force_topk(emb, "vec_id", "embedding", k=3, probe=probe)


# ---------------------------------------------------------------------------
# MinHash signatures (north-star near-dedup, md5-seeded for oracle parity).
# ---------------------------------------------------------------------------
_MINHASH_ORACLE = r"""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS w FROM documents
    ), s AS (
      SELECT doc_id,
             LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w) - 2, 1) + 1),
                            i -> ARRAY_TO_STRING(LIST_SLICE(w, i, i + 2), ' ')) AS sh
      FROM t
    )
    SELECT doc_id,
           -- hash i = 32-bit chunk i%4 of MD5((i//4) || '|' || shingle);
           -- mirrors dedup._chunk_hash (one digest -> four min-hash values)
           LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 1, 8))) AS mh0,
           LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 9, 8))) AS mh1,
           LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 17, 8))) AS mh2,
           LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 25, 8))) AS mh3
    FROM s
"""


@register("q23_minhash_signature", _MINHASH_ORACLE)
def q23_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_signatures_df(
        docs, "text", "doc_id", num_hashes=4, shingle_n=3
    ).withColumnRenamed("id", "doc_id")


# ---------------------------------------------------------------------------
# MinHash-LSH candidate pairs + exact n-gram Jaccard verify (north-star).
# ---------------------------------------------------------------------------
@register(
    "q24_lsh_near_dup",
    r"""
    WITH t AS (
      SELECT doc_id, text, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS w FROM documents
    ), s AS (
      SELECT doc_id, text,
             LIST_TRANSFORM(RANGE(1, GREATEST(LEN(w) - 2, 1) + 1),
                            i -> ARRAY_TO_STRING(LIST_SLICE(w, i, i + 2), ' ')) AS sh
      FROM t
    ), sig AS (
      -- chunked md5 min-hashes mirroring dedup._chunk_hash: hash i is the
      -- 8-hex-char chunk i%4 of MD5((i//4) || '|' || shingle)
      SELECT doc_id, text, sh,
             [LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 1, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 9, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 17, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('0|' || x), 25, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('1|' || x), 1, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('1|' || x), 9, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('1|' || x), 17, 8))),
              LIST_MIN(LIST_TRANSFORM(sh, x -> SUBSTR(MD5('1|' || x), 25, 8)))] AS sg
      FROM s
    ), bd AS (
      SELECT doc_id,
             LIST_TRANSFORM([0, 1, 2, 3],
               b -> MD5(ARRAY_TO_STRING(LIST_SLICE(sg, b * 2 + 1, b * 2 + 2), '|'))) AS bds
      FROM sig
    ), banded0 AS (
      SELECT doc_id, u.band AS band, bds[u.band + 1] AS bucket
      FROM bd, UNNEST([0, 1, 2, 3]) AS u(band)
    ), surv0 AS (
      -- mirror of the engine's max_bucket skew cap, with capped bands
      -- masked to NULL in the carried digest array so first-agreement
      -- falls through to the first SURVIVING agreeing band
      SELECT doc_id, band, bucket,
             COUNT(*) OVER (PARTITION BY band, bucket) <= 500 AS surv
      FROM banded0
    ), perid AS (
      SELECT doc_id,
             LIST(CASE WHEN surv THEN bucket END ORDER BY band) AS bds
      FROM surv0 GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, u.band AS band, bds[u.band + 1] AS bucket, bds
      FROM perid, UNNEST([0, 1, 2, 3]) AS u(band)
      WHERE bds[u.band + 1] IS NOT NULL
    ), pairs AS (
      -- FIRST-COLLISION-WINS over surviving bands, mirroring
      -- dedup.lsh_candidate_pairs: NULL (capped) entries never compare
      -- equal, so a pair is emitted from its first surviving agreeing band
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
      WHERE LIST_POSITION(LIST_TRANSFORM(RANGE(1, 5), i -> a.bds[i] = b.bds[i]), TRUE)
            = a.band + 1
    ), verified AS (
      SELECT id_a, id_b,
             ROUND(
               CAST(LEN(LIST_FILTER(LIST_DISTINCT(sa.sh), x -> LIST_CONTAINS(sb.sh, x))) AS DOUBLE)
               / LEN(LIST_DISTINCT(LIST_CONCAT(sa.sh, sb.sh))), 6) AS jaccard
      FROM pairs JOIN sig sa ON pairs.id_a = sa.doc_id
                 JOIN sig sb ON pairs.id_b = sb.doc_id
    )
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.1
    """,
)
def q24_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.near_dedup_minhash(
        docs, "text", "doc_id", threshold=0.1, num_hashes=8, bands=4, shingle_n=3,
        max_bucket=500,
    )


# ---------------------------------------------------------------------------
# Explode + rollup (SURVEY §2.5 X1 shape) over document tokens.
# ---------------------------------------------------------------------------
@register(
    "q25_explode_tokens",
    r"""
    SELECT token, COUNT(*) AS cnt
    FROM (SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS token FROM documents)
    GROUP BY token HAVING COUNT(*) >= 50
    """,
)
def q25_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 50)
    )


# ---------------------------------------------------------------------------
# Positional zip join (SURVEY §2.4 J8: i-th record ↔ cluster table index).
# ---------------------------------------------------------------------------
@register(
    "q26_positional_join",
    """
    WITH indexed AS (
      SELECT event_id, value,
             ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS pos
      FROM events
    ), cluster_map AS (
      SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS spectrumIndex,
             CAST(event_id % 50 AS BIGINT) AS clusterId
      FROM events
    )
    SELECT clusterId, COUNT(*) AS n, MIN(event_id) AS min_event,
           CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM indexed JOIN cluster_map ON indexed.pos = cluster_map.spectrumIndex
    GROUP BY clusterId
    """,
)
def q26_positional_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.joins import global_row_index

    ev = _t(spark, sf_dir, "events")  # raw ns-long ts is a valid ordering key
    # ONE two-pass distributed row numbering feeds BOTH sides (the oracle's
    # two ROW_NUMBER CTEs are over the same ordering): the quantile/count
    # stats jobs run once, and the two window subtrees share an exchange
    # the physical plan can reuse.  An earlier plain Window.orderBy here was
    # a single-task sort of the full events table hiding behind the
    # operator's whitelist entry.
    indexed = global_row_index(
        ev.select("event_id", "value", "ts"), ("ts", "event_id"), "__pos"
    ).localCheckpoint(eager=False)
    _session.track_cached(_session.checkpoint_handle(indexed))
    cluster_map = indexed.select(
        F.col("__pos").cast("int").alias("spectrumIndex"),
        (F.col("event_id") % 50).cast("bigint").alias("clusterId"),
    )
    joined = positional_zip_join(
        indexed, cluster_map,
        left_order=("ts", "event_id"), right_index_col="spectrumIndex",
        left_index_col="__pos",
    )
    return joined.groupBy("clusterId").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_event"),
        F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("n_high"),
    )


# ---------------------------------------------------------------------------
# Inference category A5 (SURVEY §2.6): supplier distinguishable iff it is the
# only supplier of some part — same collect_set-size-1 plan as the protein op.
# ---------------------------------------------------------------------------
@register(
    "q27_inference_category",
    """
    WITH pairs AS (SELECT DISTINCT l_partkey AS pf, l_suppkey AS prot FROM lineitem),
    uniq AS (
      SELECT DISTINCT prot FROM (
        SELECT pf, MIN(prot) AS prot FROM pairs
        GROUP BY pf HAVING COUNT(DISTINCT prot) = 1
      )
    ),
    prots AS (SELECT DISTINCT prot FROM pairs)
    SELECT p.prot AS proteinAccession,
           CASE WHEN u.prot IS NOT NULL THEN 'distinguishable'
                ELSE 'indistinguishable' END AS inferenceCategory
    FROM prots p LEFT JOIN uniq u ON p.prot = u.prot
    """,
)
def q27_inference_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("proteinAccession"),
        F.col("l_partkey").alias("peptidoform"),
    )
    return distinguishable_categories(li)


# ---------------------------------------------------------------------------
# Protein rollup A3–A9 (SURVEY §2.6) with lineitem mapped onto the PSM shape.
# ---------------------------------------------------------------------------
@register(
    "q28_protein_rollup",
    """
    WITH base AS (
      SELECT l_suppkey AS prot, CAST(l_partkey AS VARCHAR) AS seq,
             l_extendedprice AS score, (l_returnflag = 'R') AS dec,
             CONCAT(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR)) AS usi,
             l_returnflag AS mod_name
      FROM lineitem
    ), ded AS (
      SELECT * FROM (
        SELECT base.*, ROW_NUMBER() OVER (PARTITION BY prot, seq ORDER BY score, usi) AS rn
        FROM base
      ) WHERE rn = 1
    ), ded_agg AS (
      SELECT prot,
             COUNT(*) AS numberPSMs,
             COUNT(DISTINCT seq) AS numberPeptides,
             MIN(score) AS bestSearchEngineScoreValue
      FROM ded GROUP BY prot
    ), all_agg AS (
      -- decoy flag + mod names accumulate over ALL member PSMs (the
      -- reference's per-PSM anyMatch / proteinPTMs.addAll), NOT the
      -- sequence-deduped representatives (r10 parity fix)
      SELECT prot,
             BOOL_OR(dec) AS isDecoy,
             ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(mod_name))), ',') AS modificationsNames
      FROM base GROUP BY prot
    )
    SELECT prot AS proteinAccession,
           numberPSMs, numberPeptides, bestSearchEngineScoreValue,
           isDecoy, modificationsNames,
           ROUND(-LOG10(bestSearchEngineScoreValue), 5) AS proteinScore
    FROM ded_agg JOIN all_agg USING (prot)
    """,
)
def q28_protein_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("proteinAccession"),
        F.col("l_partkey").cast("string").alias("peptideSequence"),
        F.col("l_extendedprice").alias("score"),
        (F.col("l_returnflag") == "R").alias("isDecoy"),
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")).alias("usi"),
        F.array(F.col("l_returnflag")).alias("modificationNames"),
        F.lit(None).cast("string").alias("peptidoform"),
        F.lit(None).cast("int").alias("precursorCharge"),
        F.lit(None).cast("double").alias("precursorMz"),
    )
    rolled = protein_rollup(li, protein_col="proteinAccession", score_col="score", better="lower")
    return rolled.select(
        "proteinAccession",
        "numberPSMs",
        "numberPeptides",
        "bestSearchEngineScoreValue",
        "isDecoy",
        # string, not array<string>: the driver canonicalizes via pandas
        # sort_values, which cannot factorize ndarray cells
        F.array_join("modificationsNames", ",").alias("modificationsNames"),
        F.round(-F.log10("bestSearchEngineScoreValue"), 5).alias("proteinScore"),
    )


# ---------------------------------------------------------------------------
# Peptide mass + missed cleavages C11/C12 (SURVEY §2.10) on part names.
# ---------------------------------------------------------------------------
@register(
    "q29_mass_cleavage",
    r"""
    WITH t AS (
      SELECT p_partkey,
             REGEXP_REPLACE(UPPER(p_name), ' ', '', 'g') AS seq
      FROM part
    )
    SELECT p_partkey, seq,
           LEN(REGEXP_EXTRACT_ALL(
             REGEXP_REPLACE(REGEXP_REPLACE(seq, '[KR]$', ''), '(K|R)P', '', 'g'),
             '[KR]')) AS mc,
           (LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(seq, ''), ch ->
             CASE ch
               WHEN 'G' THEN 57021460 WHEN 'A' THEN 71037110 WHEN 'S' THEN 87032030
               WHEN 'P' THEN 97052760 WHEN 'V' THEN 99068410 WHEN 'T' THEN 101047680
               WHEN 'C' THEN 103009190 WHEN 'L' THEN 113084060 WHEN 'I' THEN 113084060
               WHEN 'N' THEN 114042930 WHEN 'D' THEN 115026940 WHEN 'Q' THEN 128058580
               WHEN 'K' THEN 128094960 WHEN 'E' THEN 129042590 WHEN 'M' THEN 131040490
               WHEN 'H' THEN 137058910 WHEN 'F' THEN 147068410 WHEN 'R' THEN 156101110
               WHEN 'Y' THEN 163063330 WHEN 'W' THEN 186079310 ELSE 0 END))
             + 18010565) / 1000000.0 AS mass
    FROM t
    """,
)
def q29_mass_cleavage(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _tw(spark, sf_dir, "part")  # r13: mass/cleavage exprs are scan-fused
    seq = F.regexp_replace(F.upper(F.col("p_name")), " ", "")
    return p.select(
        "p_partkey",
        seq.alias("seq"),
        missed_cleavages(seq).alias("mc"),
        theoretical_mass(seq).alias("mass"),
    )


# ---------------------------------------------------------------------------
# Cluster-consensus best PSM (SURVEY §2.6 A11–A13, InferenceService.java:99-141).
# lineitem mapped onto the PSM/cluster domain: order = cluster, line = PSM.
# ---------------------------------------------------------------------------
@register(
    "q30_cluster_best_psm",
    """
    WITH psms AS (
      SELECT l_orderkey AS clusterId,
             l_orderkey || '-' || l_linenumber AS usi,
             l_returnflag || 'LEP' AS peptideSequence,
             l_linestatus || '/2' AS peptidoform,
             l_extendedprice AS score
      FROM lineitem
    ), pure AS (
      SELECT clusterId FROM psms GROUP BY clusterId
      HAVING COUNT(DISTINCT REPLACE(peptideSequence, 'L', 'I')) = 1
    ), counts AS (
      SELECT clusterId, peptidoform, COUNT(*) AS n
      FROM psms GROUP BY clusterId, peptidoform
    ), tot AS (
      SELECT clusterId, COUNT(*) AS t FROM psms GROUP BY clusterId
    ), valid AS (
      SELECT c.clusterId, c.peptidoform FROM counts c
      JOIN tot USING (clusterId) WHERE 2 * c.n > tot.t
    )
    SELECT clusterId, usi, peptideSequence, peptidoform, score FROM (
      SELECT p.*, ROW_NUMBER() OVER (PARTITION BY p.clusterId
                                     ORDER BY p.score, p.usi) AS rn
      FROM psms p
      JOIN pure USING (clusterId)
      JOIN valid USING (clusterId, peptidoform)
    ) WHERE rn = 1
    """,
)
def q30_cluster_best_psm(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    psms = li.select(
        F.col("l_orderkey").alias("clusterId"),
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("usi"),
        F.concat(F.col("l_returnflag"), F.lit("LEP")).alias("peptideSequence"),
        F.concat(F.col("l_linestatus"), F.lit("/2")).alias("peptidoform"),
        F.col("l_extendedprice").alias("score"),
    )
    return cluster_ops.best_psm_per_cluster(psms).select(
        "clusterId", "usi", "peptideSequence", "peptidoform", "score"
    )


# ---------------------------------------------------------------------------
# Occam's-razor protein inference (SURVEY §2.6; PIAModelerService.java:80-96).
# The fixture maps peptides onto a 60-element universe so the oracle can
# mirror the iterative greedy cover with BIGINT bitmasks in a recursive
# CTE: group-by-identical-set, EXISTS strict-superset absorption, then one
# argmax pick per recursion step (gain DESC, groupId ASC tie-break —
# exactly the operator's heap order).  Proteins keyed by orderkey give
# sparse 1-7 peptide sets, so all three categories and a non-trivial cover
# appear (~12.5k groups / ~4.9k subsets / 9 leading at sf0.01).
# ---------------------------------------------------------------------------
@register(
    "q31_occams_razor",
    """
    WITH RECURSIVE pairs AS (
      SELECT DISTINCT 'PROT' || l_orderkey AS prot, CAST(l_partkey % 60 AS INT) AS pep
      FROM lineitem WHERE l_orderkey % 16 = 0
    ),
    masks AS (
      SELECT prot, BIT_OR(1::BIGINT << pep) AS mask FROM pairs GROUP BY prot
    ),
    grp AS (
      SELECT mask, LIST(prot ORDER BY prot) AS members, MIN(prot) AS gid
      FROM masks GROUP BY mask
    ),
    subs AS (
      SELECT g1.gid FROM grp g1
      WHERE EXISTS (SELECT 1 FROM grp g2
                    WHERE (g1.mask & g2.mask) = g1.mask AND g1.mask <> g2.mask)
    ),
    nonsub AS (SELECT gid, mask FROM grp WHERE gid NOT IN (SELECT gid FROM subs)),
    cover(step, pick, covered) AS (
      SELECT 0, CAST(NULL AS VARCHAR), 0::BIGINT
      UNION ALL
      SELECT cover.step + 1, c.gid, cover.covered | c.mask
      FROM cover, LATERAL (
        SELECT gid, mask FROM nonsub
        WHERE BIT_COUNT(mask & ~cover.covered) > 0
        ORDER BY BIT_COUNT(mask & ~cover.covered) DESC, gid
        LIMIT 1
      ) c
    )
    SELECT m.prot AS proteinAccession, g.gid AS groupId,
           g.gid IN (SELECT pick FROM cover WHERE pick IS NOT NULL) AS isLeading,
           CASE WHEN g.gid IN (SELECT gid FROM subs) THEN 'subset'
                WHEN LEN(g.members) > 1 THEN 'indistinguishable'
                ELSE 'distinguishable' END AS category
    FROM masks m JOIN grp g ON m.mask = g.mask
    """,
)
def q31_occams_razor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderkey % 16 bounds the group table at reference scale (~10^4
    # proteins at sf0.1): with a 60-peptide universe the rarest-peptide
    # subset pruning cannot block, so the driver loop is O(groups^2) and
    # an unbounded orderkey key grows it 100x past the domain's size
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 16 == 0)
    psms = li.select(
        F.concat(F.lit("PEP"), F.col("l_partkey") % 60).alias("peptideSequence"),
        F.array(F.concat(F.lit("PROT"), F.col("l_orderkey"))).alias("proteinAccessions"),
    )
    return inference.occams_razor(psms).select(
        "proteinAccession", "groupId", "isLeading", "category"
    )


# ---------------------------------------------------------------------------
# Spectrum-id normalization at ingest (SURVEY §2.10 C9/C10, §2.1 S7;
# SubmissionPipelineUtils.java:229-256).
# ---------------------------------------------------------------------------
@register(
    "q32_spectrum_id_norm",
    """
    WITH src AS (
      SELECT l_orderkey, l_linenumber,
             CASE l_linenumber % 4
               WHEN 0 THEN 'query=' || l_orderkey
               WHEN 1 THEN 'index=' || l_orderkey
               WHEN 2 THEN 'controllerType=0 controllerNumber=1 scan=' || l_orderkey
               ELSE 'sample=1 period=1 cycle=' || l_orderkey || ' experiment=2'
             END AS sourceId,
             CASE l_linenumber % 4
               WHEN 0 THEN 'MASCOT_QUERY' WHEN 1 THEN 'MULTI_PEAK'
               WHEN 2 THEN 'MZML' ELSE 'NATIVE'
             END AS fmt
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, sourceId, fmt,
           CASE fmt
             WHEN 'MASCOT_QUERY' THEN CAST(l_orderkey + 1 AS VARCHAR)
             WHEN 'MULTI_PEAK'   THEN CAST(l_orderkey + 1 AS VARCHAR)
             WHEN 'MZML'         THEN CAST(l_orderkey AS VARCHAR)
             ELSE sourceId
           END AS normId
    FROM src
    """,
)
def q32_spectrum_id_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _tw(spark, sf_dir, "lineitem")  # r13: per-row regex is scan-fused
    mod = F.col("l_linenumber") % 4
    src = li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(mod == 0, F.concat(F.lit("query="), F.col("l_orderkey")))
        .when(mod == 1, F.concat(F.lit("index="), F.col("l_orderkey")))
        .when(
            mod == 2,
            F.concat(F.lit("controllerType=0 controllerNumber=1 scan="), F.col("l_orderkey")),
        )
        .otherwise(
            F.concat(
                F.lit("sample=1 period=1 cycle="), F.col("l_orderkey"), F.lit(" experiment=2")
            )
        )
        .alias("sourceId"),
        F.when(mod == 0, F.lit("MASCOT_QUERY"))
        .when(mod == 1, F.lit("MULTI_PEAK"))
        .when(mod == 2, F.lit("MZML"))
        .otherwise(F.lit("NATIVE"))
        .alias("fmt"),
    )
    return src.withColumn("normId", normalize_spectrum_id("sourceId", "fmt"))


# ---------------------------------------------------------------------------
# MGF record formatting (SURVEY §2.2 K5; MGFPRIDEWriter.java:12-62) — the
# full BEGIN IONS block as one string column, byte-compared to printf SQL.
# ---------------------------------------------------------------------------
@register(
    "q33_mgf_record",
    """
    WITH s AS (
      SELECT l_orderkey || '-' || l_linenumber AS usi,
             'PEPK/2' AS peptidoform,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) / 100 AS DECIMAL(18,6)) AS DOUBLE) AS mz,
             2 AS z,
             [CAST(l_quantity AS DOUBLE), 7.25] AS masses,
             [1.0, CAST(l_discount AS DOUBLE)] AS intensities
      FROM lineitem
    )
    SELECT usi,
           'BEGIN IONS' || chr(10) ||
           'TITLE=id=' || usi || ',sequence=' || peptidoform || chr(10) ||
           'PEPMASS=' || CAST(mz AS VARCHAR) || chr(10) ||
           'CHARGE=' || CAST(CAST(z AS DOUBLE) AS VARCHAR) || '+' || chr(10) ||
           ARRAY_TO_STRING(LIST_TRANSFORM(RANGE(1, LEN(masses) + 1),
             i -> printf('%10.3f', masses[i]) || chr(9) ||
                  LTRIM(printf('%10.3f', intensities[i]))), chr(10)) || chr(10) ||
           'END IONS' AS mgf
    FROM s
    """,
)
def q33_mgf_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _tw(spark, sf_dir, "lineitem")  # r13: format_string is scan-fused
    s = li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("usi"),
        F.lit("PEPK/2").alias("peptidoform"),
        (F.col("l_extendedprice").cast("decimal(18,2)") / 100).cast("double").alias("mz"),
        F.lit(2).alias("z"),
        F.array(F.col("l_quantity").cast("double"), F.lit(7.25)).alias("masses"),
        F.array(F.lit(1.0), F.col("l_discount").cast("double")).alias("intensities"),
    )
    # peak_format="exact" — the writer DEFAULT, so the bench row times
    # the contract path (r9 verdict honesty note: the earlier "decimal"
    # row flattered the default by ~1.4×).  On this fixture domain
    # (integers, 7.25, 1.0, 0.00–0.10 step 0.01) both formatters are
    # provably identical to the oracle's %10.3f (agreement asserted in
    # test_sources_sinks.py), so the oracle is unchanged; the fast
    # "decimal" opt-in remains available on write_mgf.
    # n_peaks=2 (r13): this fixture builds exactly-2-wide peak arrays, so
    # the per-peak format_string unrolls to whole-stage codegen instead of
    # an interpreted zip_with lambda — byte-identical records (mgf_record
    # docstring; oracle-proven).
    return s.select(
        "usi",
        mgf_record(
            F.col("usi"), F.col("peptidoform"), F.col("mz"), F.col("z"),
            F.col("masses"), F.col("intensities"), peak_format="exact",
            n_peaks=2,
        ).alias("mgf"),
    )


# ---------------------------------------------------------------------------
# Embedding near-duplicate pairs (north-star dedup: embedding-cosine) —
# bounded candidate window keeps the self-join linear.
# ---------------------------------------------------------------------------
@register(
    "q34_embedding_near_dup",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(LIST_INNER_PRODUCT(a.v, b.v) /
                 (SQRT(LIST_INNER_PRODUCT(a.v, a.v)) * SQRT(LIST_INNER_PRODUCT(b.v, b.v))),
                 6) AS cosine
    FROM e a JOIN e b
      ON b.vec_id > a.vec_id AND b.vec_id <= a.vec_id + 8
    WHERE ROUND(LIST_INNER_PRODUCT(a.v, b.v) /
                (SQRT(LIST_INNER_PRODUCT(a.v, a.v)) * SQRT(LIST_INNER_PRODUCT(b.v, b.v))),
                6) > 0.2
    """,
)
def q34_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The bounded id-window is materialized as an explode → EQUI-join (hash
    # join, shuffles 8n rows) instead of a (id_b BETWEEN …) theta join,
    # which Spark can only plan as a broadcast nested loop — O(n²)
    # comparisons, 20× slower at sf0.1 and fatal at 100 TB.
    emb = _tw(spark, sf_dir, "embeddings")  # r13: pair cosines are scan-fused
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        similarity.l2_norm(F.col("embedding")).alias("__na"),
        F.explode(F.sequence(F.col("vec_id") + 1, F.col("vec_id") + 8)).alias("id_b"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        similarity.l2_norm(F.col("embedding")).alias("__nb"),
    )
    pairs = a.join(b, "id_b")
    cos = F.round(
        similarity.pair_cosine(F.col("va"), F.col("vb"), F.col("__na"), F.col("__nb")), 6
    )
    return pairs.withColumn("cosine", cos).filter(F.col("cosine") > 0.2).select(
        "id_a", "id_b", "cosine"
    )


# ---------------------------------------------------------------------------
# SimHash near-dup fingerprints (north-star).  The registry exercises the
# md5-based 60-bit variant, which DuckDB reproduces bit-for-bit; the
# faster xxhash64 production variant (dedup.simhash64) shares the same
# vote fold and stays unit-tested (tests/test_dedup.py).
# ---------------------------------------------------------------------------
@register(
    "q35_simhash",
    r"""
    WITH words AS (
      SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS w FROM documents
    ),
    sh AS (
      SELECT doc_id,
             LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(w)-1, 1)),
                 i -> ARRAY_TO_STRING(w[i:i+1], ' '))) AS shingles
      FROM words
    ),
    tok AS (
      SELECT doc_id, ('0x' || SUBSTR(MD5(s.sh2), 1, 15))::BIGINT AS h
      FROM sh, UNNEST(sh.shingles) AS s(sh2)
    ),
    votes AS (
      SELECT doc_id, b.b AS b,
             SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM tok, (SELECT UNNEST(GENERATE_SERIES(0, 59)) AS b) b
      GROUP BY doc_id, b.b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN 1::BIGINT << b ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def q35_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explode→vote-sum shape (simhash_df): identical bits to the in-row
    # simhash_md5 fold, but codegen + map-side combine instead of an
    # interpreted per-row HOF fold — ~10% at sf0.1, ~30% at 64x corpus
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_df(docs, "text", "doc_id", variant="md5").select(
        F.col("id").alias("doc_id"), "simhash"
    )


# ---------------------------------------------------------------------------
# Sliding (hopping) window aggregation — streaming surface, batch-checked
# (pride_spark.streaming.events.sliding_counts; SURVEY §2.12 extension).
# ---------------------------------------------------------------------------
@register(
    "q36_sliding_window",
    """
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
    x AS (
      SELECT event_type,
             TIMESTAMP '1970-01-01 00:00:00'
               + TO_SECONDS(CAST((FLOOR(EPOCH(ts) / 1800) - u.k) * 1800 AS BIGINT))
               AS window_start
      FROM e, UNNEST([0, 1]) AS u(k)
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type, COUNT(*) AS n
    FROM x GROUP BY window_start, event_type
    """,
)
def q36_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.streaming.events import sliding_counts

    return sliding_counts(
        _events(spark, sf_dir), window="1 hour", slide="30 minutes", streaming=False
    )


# ---------------------------------------------------------------------------
# Session windows (gap-based) — streaming surface, batch-checked
# (pride_spark.streaming.events.session_counts).  Oracle: gaps-and-islands.
# ---------------------------------------------------------------------------
@register(
    "q37_session_window",
    """
    WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    m AS (
      -- ORDER BY must be a TOTAL order (ts, event_id): with duplicate
      -- timestamps a ts-only sort leaves tie order engine-chosen, and the
      -- LAG window and the cumsum window may order the SAME tie run
      -- differently — the new-session flag then lands mid-tie and splits
      -- a session nondeterministically (observed at the 10x gate, where
      -- the scaled corpus manufactures exact-duplicate timestamps)
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id, COUNT(*) AS n
    FROM g GROUP BY user_id, sid
    """,
)
def q37_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.streaming.events import session_counts

    return session_counts(_events(spark, sf_dir), gap="30 minutes", streaming=False)


# ---------------------------------------------------------------------------
# Multimodal feature extraction (north-star; Arrow-batched mapInPandas with
# stubbed decode kernels). The stub decode is deterministic byte
# arithmetic, so even the Python mapInPandas kernel is oracle-checkable:
# DuckDB extracts payload bytes as hex pairs and reproduces the byte
# stats and the big-endian signed 8-byte "phash" exactly.
# ---------------------------------------------------------------------------
@register(
    "q38_image_features",
    """
    WITH img AS (
      SELECT doc_id AS media_id, ENCODE(text) AS p
      FROM documents WHERE doc_id % 3 = 0
    ),
    b AS (SELECT media_id, HEX(p) AS fh, OCTET_LENGTH(p) AS n FROM img),
    v AS (
      SELECT media_id, n,
             LIST_TRANSFORM(GENERATE_SERIES(1, n),
                            i -> ('0x' || SUBSTR(fh, 2*i-1, 2))::INT) AS bytes,
             ('0x'||SUBSTR(RPAD(SUBSTR(fh,1,16),16,'0'),1,8))::BIGINT::HUGEINT
               * 4294967296::HUGEINT
             + ('0x'||SUBSTR(RPAD(SUBSTR(fh,1,16),16,'0'),9,8))::BIGINT::HUGEINT AS pv
      FROM b
    )
    SELECT media_id,
           CAST(n AS INT) AS n_bytes,
           CAST(CASE WHEN n = 0 THEN 0
                     ELSE TRUNC(LIST_SUM(bytes)::DOUBLE / n) END AS INT) AS byte_mean,
           CAST(CASE WHEN pv >= 9223372036854775808::HUGEINT
                     THEN pv - 18446744073709551616::HUGEINT
                     ELSE pv END AS BIGINT) AS phash
    FROM v
    """,
)
def q38_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators import multimodal as mm

    docs = _t(spark, sf_dir, "documents")
    return mm.image_features(mm.synthesize_media_from_documents(docs))


# ---------------------------------------------------------------------------
# Modification regroup (SURVEY §2.5 X3; PrideAnalysisAssayService.java:
# 1007-1046) — merge same-accession PTMs, dedupe+sort positions, in-row HOFs.
# ---------------------------------------------------------------------------
@register(
    "q39_mod_regroup",
    """
    WITH raw AS (
      SELECT l_orderkey || '-' || l_linenumber || '-' || l_partkey || '-' || l_suppkey AS psmId,
             m.pos AS position,
             'UNIMOD:' || (l_partkey % 2) AS accession,
             'MOD' || (l_partkey % 2) AS name
      FROM lineitem,
           UNNEST([1 + l_linenumber % 3,
                   1 + CAST(l_quantity AS INT) % 5]) AS m(pos)
    )
    SELECT psmId, accession,
           MIN(name) AS name,
           ARRAY_TO_STRING(LIST(DISTINCT position ORDER BY position), ',') AS positions
    FROM raw GROUP BY psmId, accession
    """,
)
def q39_mod_regroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.modifications import regroup_modifications_flat

    # r13: the in-row regroup (zero-shuffle since the row_unique_keys
    # rewrite) fuses into the scan stage — widen or it runs on one core
    li = _tw(spark, sf_dir, "lineitem")
    acc = F.concat(F.lit("UNIMOD:"), F.col("l_partkey") % 2)
    name = F.concat(F.lit("MOD"), F.col("l_partkey") % 2)
    mods = F.array(
        F.struct(
            (1 + F.col("l_linenumber") % 3).cast("int").alias("position"),
            acc.alias("accession"),
            name.alias("name"),
        ),
        F.struct(
            (1 + F.col("l_quantity").cast("int") % 5).cast("int").alias("position"),
            acc.alias("accession"),
            name.alias("name"),
        ),
    )
    raw = li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey").alias("psmId"),
        mods.alias("modifications"),
    )
    # flat variant with row_unique_keys (r13): psmId embeds the lineitem
    # primary key (orderkey, linenumber), so every key group's mods live
    # in one row — the regroup runs in-row and the groupBy exchange +
    # ObjectHashAggregate vanish (plans/r13/q39_*_after.txt: 1 Exchange →
    # 0).  Output identical (oracle-proven; operator equivalence asserted
    # in tests/test_modifications_ws.py).
    out = regroup_modifications_flat(raw, ["psmId"], row_unique_keys=True)
    # stringified for the driver's pandas canonicalizer (no ndarray cells)
    return out.withColumn(
        "positions", F.array_join(F.col("positions").cast("array<string>"), ",")
    )


# ---------------------------------------------------------------------------
# Delta-mass validation (SURVEY §2.3 F14, §2.10 C11;
# PrideAnalysisAssayService.java:646-660): hard-drop >10, flag >0.9.
# ---------------------------------------------------------------------------
@register(
    "q40_delta_mass",
    """
    WITH t AS (
      SELECT p_partkey,
             REPLACE(UPPER(p_name), ' ', '') AS seq,
             p_retailprice / 2 AS observed
      FROM part
    ), theo AS (
      SELECT p_partkey, seq, observed,
             (CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(seq) + 1),
               i -> CASE SUBSTR(seq, i, 1)
               WHEN 'G' THEN 57021460 WHEN 'A' THEN 71037110 WHEN 'S' THEN 87032030
               WHEN 'P' THEN 97052760 WHEN 'V' THEN 99068410 WHEN 'T' THEN 101047680
               WHEN 'C' THEN 103009190 WHEN 'L' THEN 113084060 WHEN 'I' THEN 113084060
               WHEN 'N' THEN 114042930 WHEN 'D' THEN 115026940 WHEN 'Q' THEN 128058580
               WHEN 'K' THEN 128094960 WHEN 'E' THEN 129042590 WHEN 'M' THEN 131040490
               WHEN 'H' THEN 137058910 WHEN 'F' THEN 147068410 WHEN 'R' THEN 156101110
               WHEN 'Y' THEN 163063330 WHEN 'W' THEN 186079310 ELSE 0 END)) AS BIGINT)
              + 18010565) / 1000000.0 AS mass
      FROM t
    )
    SELECT p_partkey, seq,
           FLOOR(ABS(observed - (mass + 2 * 1.00727646688) / 2) * 1e6) / 1e6 AS deltaMz,
           ABS(observed - (mass + 2 * 1.00727646688) / 2) > 0.9 AS deltaMzSuspect
    FROM theo
    WHERE ABS(observed - (mass + 2 * 1.00727646688) / 2) <= 10
    """,
)
def q40_delta_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.filters import delta_mass_validation

    p = _t(spark, sf_dir, "part")
    seq = F.regexp_replace(F.upper(F.col("p_name")), " ", "")
    psms = p.select(
        "p_partkey",
        seq.alias("seq"),
        (F.col("p_retailprice") / 2).alias("massToCharge"),
        F.lit(2).alias("charge"),
    )
    out = delta_mass_validation(psms, sequence="seq")
    return out.select(
        "p_partkey",
        "seq",
        (F.floor(F.col("deltaMz") * 1e6) / 1e6).alias("deltaMz"),
        "deltaMzSuspect",
    )


# ---------------------------------------------------------------------------
# Score denoising + param projection (SURVEY §2.3 F16/F17;
# PrideAnalysisAssayService.java:594-605,613-625) — array filter() exprs.
# ---------------------------------------------------------------------------
@register(
    "q41_score_denoise",
    """
    WITH raw AS (
      SELECT l_orderkey || '-' || l_linenumber AS psmId,
             [STRUCT_PACK(accession := 'MS:1002355', value := CAST(l_discount AS VARCHAR)),
              STRUCT_PACK(accession := 'MS:1001153', value := CAST(l_quantity AS VARCHAR)),
              STRUCT_PACK(accession := 'MS:1001155', value := CAST(l_tax AS VARCHAR))]
             AS scores
      FROM lineitem
    ), flt AS (
      SELECT psmId,
             LIST_FILTER(scores, s -> s.value IS NOT NULL
                          AND CAST(s.value AS DOUBLE) <> 0.0
                          AND s.accession NOT IN ('MS:1002355', 'MS:1002354')) AS kept
      FROM raw
    )
    SELECT psmId, u.s.accession AS accession, u.s.value AS value
    FROM flt, UNNEST(kept) AS u(s)
    """,
)
def q41_score_denoise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.filters import score_denoise_flat

    li = _t(spark, sf_dir, "lineitem")
    scores = F.array(
        F.struct(F.lit("MS:1002355").alias("accession"), F.col("l_discount").cast("string").alias("value")),
        F.struct(F.lit("MS:1001153").alias("accession"), F.col("l_quantity").cast("string").alias("value")),
        F.struct(F.lit("MS:1001155").alias("accession"), F.col("l_tax").cast("string").alias("value")),
    )
    raw = li.select(
        F.concat_ws("-", "l_orderkey", "l_linenumber").alias("psmId"),
        scores.alias("scores"),
    )
    # flat variant (r13): the query's output IS the exploded relation, so
    # explode-then-filter keeps the whole plan in codegen; the in-row
    # score_denoise HOF ran interpreted AND was evaluated twice (explode's
    # inferred size()>0 pre-filter) — same rows, oracle-proven
    return score_denoise_flat(raw, ["psmId"], "scores").select(
        "psmId", "s.accession", "s.value"
    )


# ---------------------------------------------------------------------------
# ProForma peptidoform encoding (SURVEY §2.10 C6;
# SubmissionPipelineUtils.java:307-340) — JVM HOF interleaving, no UDF.
# ---------------------------------------------------------------------------
@register(
    "q42_proforma",
    """
    WITH t AS (
      SELECT p_partkey,
             REPLACE(UPPER(p_name), ' ', '') AS seq,
             1 + p_partkey % 4 AS pos
      FROM part
    )
    SELECT p_partkey,
           CASE WHEN pos = 0 THEN '[UNIMOD:35]-' || seq
                ELSE SUBSTR(seq, 1, pos) || '[UNIMOD:35]' || SUBSTR(seq, pos + 1)
           END || '/2' AS peptidoform
    FROM t WHERE pos <= LEN(seq)
    """,
)
def q42_proforma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.functions.proforma import encode_peptidoform

    p = _tw(spark, sf_dir, "part")  # r13: the encode HOF is scan-fused
    seq = F.regexp_replace(F.upper(F.col("p_name")), " ", "")
    t = p.select(
        "p_partkey",
        seq.alias("seq"),
        (1 + F.col("p_partkey") % 4).cast("int").alias("pos"),
    ).filter(F.col("pos") <= F.length("seq"))
    mods = F.array(
        F.struct(
            F.col("pos").alias("position"),
            F.lit("UNIMOD:35").alias("accession"),
            F.lit("Oxidation").alias("name"),
            F.lit(15.994915).alias("mass"),
        )
    )
    return t.select(
        "p_partkey", encode_peptidoform("seq", mods, F.lit(2)).alias("peptidoform")
    )


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (north-star similarity scale path) — probing ALL buckets
# is exact, so brute-force SQL is the oracle; smaller n_probe trades recall.
# Folded in (round 4, same 50-entry-cap technique as q48's method column):
# method='pq' gates PRODUCT-QUANTIZATION compressed-domain scoring
# (similarity.pq_topk) with seeded literal codebooks — DuckDB replays the
# exact per-subspace argmin encode and the ADC left-to-right fold, so the
# 16-32x-narrower-scan ANN path gets a value-hash oracle row.
# Round 5 adds two more gated methods:
# - method='ivf_pq': the COMPOSED persistent IVF-PQ index
#   (ann_index.build_ivf_index(pq_codebooks=...) + search_ivf_pq_index):
#   partition-pruned code scan → centroid equi-join → rounded-ADC
#   shortlist of 40 → exact cosine re-rank.  Full probe makes the
#   candidate set complete, so the oracle is the same ADC shortlist +
#   exact-cosine re-rank in SQL — the funnel itself is what's gated.
# - method='pq_trained': DATA-ADAPTIVE codebooks through the same ADC
#   oracle.  similarity.pq_train(order_by_id=True) samples the first 320
#   rows by vec_id from the FIXED sf0.001 embeddings fixture (training
#   is corpus-sample-based, so pinning the training table is exactly how
#   production PQ amortizes it) and runs the shared numpy Lloyd kernel;
#   the oracle generator replays the identical kernel over the identical
#   pyarrow-read rows — bit-identical codebooks by construction, then
#   the proven literal-chain SQL gates encode + ADC end-to-end.
# ---------------------------------------------------------------------------
_PQ_M, _PQ_K, _PQ_DIM = 4, 8, 64
_PQ_RERANK = 40
#: fixed canonical training fixture — sf-independent, so the trained
#: codebooks are constants shared by the Spark query and the oracle SQL.
#: Overridable for machines that keep the fixture elsewhere.
_PQ_TRAIN_DIR = _os.environ.get("SPARK_GRAFT_PQ_TRAIN_DIR", "/root/testdata/sf0.001")

_PQ_TRAINED_BOOKS_CACHE: list | None = None


def _pq_trained_books() -> list[list[list[float]]]:
    """Engine-free replica of ``pq_train(order_by_id=True)`` over the
    canonical training fixture: pyarrow read → sort by vec_id → first
    320 rows → the SAME ``_lloyd_subspace_books`` numpy kernel Spark's
    trainer calls, on the same float64 matrix."""
    global _PQ_TRAINED_BOOKS_CACHE
    if _PQ_TRAINED_BOOKS_CACHE is not None:
        return _PQ_TRAINED_BOOKS_CACHE
    import numpy as np
    import pyarrow.parquet as papq

    tbl = papq.read_table(
        f"{_PQ_TRAIN_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    n = max(_PQ_K, 40 * _PQ_K)
    rows = tbl.slice(0, n).column("embedding").to_pylist()
    x = np.asarray(rows, dtype=np.float64)
    _PQ_TRAINED_BOOKS_CACHE = similarity._lloyd_subspace_books(x, _PQ_M, _PQ_K, 3)
    return _PQ_TRAINED_BOOKS_CACHE


def _pq_sql_parts(books: list[list[list[float]]]) -> tuple[str, str]:
    """(codes_sql, adc_sql) literal-chain DuckDB expressions for one
    codebook family — every dot product an EXPLICIT left-to-right
    addition chain / LIST_REDUCE, bit-identical to Spark's fold."""
    sub = _PQ_DIM // _PQ_M

    def flit(x: float, nd: int = 8) -> str:
        # fixed-point mantissa + e0 suffix: forces a DOUBLE literal and
        # never emits exponent notation (repr of an 8-dp-rounded value
        # like 1e-08 would otherwise render as the unparseable 1e-08e0).
        # The centroids are pre-rounded to <= nd decimals, so the fixed
        # print is exact and DuckDB parses back the identical double.
        return f"{x:.{nd}f}e0"

    def chain(vec: str, off: int, cent: list[float]) -> str:
        return " + ".join(
            f"{vec}[{off + i + 1}]*{flit(x)}" for i, x in enumerate(cent)
        )

    code_exprs = []
    for j, book in enumerate(books):
        entries = ", ".join(
            "{'d': %s - 2e0*(%s), 'code': %d}"
            % (flit(round(sum(x * x for x in c), 10), 10), chain("v", j * sub, c), ci)
            for ci, c in enumerate(book)
        )
        code_exprs.append(f"LIST_SORT([{entries}])[1].code")
    codes_sql = ",\n             ".join(code_exprs)

    adc_terms = []
    for j, book in enumerate(books):
        lists = ", ".join("[" + ", ".join(flit(x) for x in c) + "]" for c in book)
        adc_terms.append(
            f"LIST_REDUCE(LIST_TRANSFORM(RANGE(1, {sub + 1}), "
            f"i -> qv[{j * sub} + i] * (CAST([{lists}] AS DOUBLE[][]))"
            f"[codes[{j + 1}] + 1][i]), (a, b) -> a + b)"
        )
    adc_sql = "\n               + ".join(adc_terms)
    return codes_sql, adc_sql


def _pq_oracle_sql() -> str:
    """q43's oracle: exact-cosine top-3 (method='ivf'; probing all IVF
    buckets is exact) UNION seeded-codebook PQ/ADC top-3 (method='pq')
    UNION the ADC-shortlist + exact-re-rank funnel (method='ivf_pq';
    the shortlist CTE reuses the seeded rounded-ADC scores) UNION
    trained-codebook PQ/ADC top-3 (method='pq_trained')."""
    from pride_spark.operators.similarity import pq_codebooks_seeded

    books = pq_codebooks_seeded(m=_PQ_M, k=_PQ_K, dim=_PQ_DIM)
    codes_sql, adc_sql = _pq_sql_parts(books)
    codes_sql_t, adc_sql_t = _pq_sql_parts(_pq_trained_books())

    return f"""
    WITH p AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 50),
    b AS (SELECT vec_id AS nbr_id, CAST(embedding AS DOUBLE[]) AS nv FROM embeddings),
    scored AS (
      SELECT query_id, nbr_id,
             ROUND(LIST_INNER_PRODUCT(qv, nv) /
                   (SQRT(LIST_INNER_PRODUCT(qv, qv)) * SQRT(LIST_INNER_PRODUCT(nv, nv))),
                   6) AS score
      FROM p JOIN b ON query_id <> nbr_id
    ),
    enc AS (
      SELECT vec_id AS nbr_id,
             [{codes_sql}] AS codes
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    ),
    pq_scored AS (
      SELECT query_id, nbr_id,
             ROUND({adc_sql}, 6) AS score
      FROM p JOIN enc ON query_id <> nbr_id
    ),
    enc_t AS (
      SELECT vec_id AS nbr_id,
             [{codes_sql_t}] AS codes
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    ),
    pq_scored_t AS (
      SELECT query_id, nbr_id,
             ROUND({adc_sql_t}, 6) AS score
      FROM p JOIN enc_t ON query_id <> nbr_id
    ),
    ivfpq_short AS (
      SELECT query_id, nbr_id FROM (
        SELECT query_id, nbr_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, nbr_id) AS r
        FROM pq_scored
      ) WHERE r <= {_PQ_RERANK}
    ),
    ivfpq AS (
      SELECT s.query_id, s.nbr_id, sc.score
      FROM ivfpq_short s JOIN scored sc
        ON s.query_id = sc.query_id AND s.nbr_id = sc.nbr_id
    )
    SELECT 'ivf' AS method, query_id, nbr_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, nbr_id) AS rank
      FROM scored
    ) WHERE rank <= 3
    UNION ALL
    SELECT 'pq' AS method, query_id, nbr_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, nbr_id) AS rank
      FROM pq_scored
    ) WHERE rank <= 3
    UNION ALL
    SELECT 'ivf_pq' AS method, query_id, nbr_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, nbr_id) AS rank
      FROM ivfpq
    ) WHERE rank <= 3
    UNION ALL
    SELECT 'pq_trained' AS method, query_id, nbr_id, score, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, nbr_id) AS rank
      FROM pq_scored_t
    ) WHERE rank <= 3
    """


def _table_fingerprint(sf_dir: str, table: str) -> str:
    """12-hex content fingerprint of one table in ``sf_dir`` (path +
    file names/sizes/mtimes) — the cache key for build-once artifacts
    derived from that table, so regenerating the corpus at the same
    path invalidates instead of silently serving stale builds."""
    import hashlib

    h = hashlib.md5(f"{sf_dir}:{table}".encode())
    t_path = _os.path.join(sf_dir, f"{table}.parquet")
    if _os.path.isdir(t_path):
        for fn in sorted(_os.listdir(t_path)):
            st = _os.stat(_os.path.join(t_path, fn))
            h.update(f"{fn}:{st.st_size}:{st.st_mtime_ns};".encode())
    elif _os.path.exists(t_path):
        st = _os.stat(t_path)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def _corpus_fingerprint(sf_dir: str) -> str:
    """Fingerprint of the embeddings corpus — the cache key for
    everything q43 builds once per corpus: the persistent IVF-PQ index
    AND the in-process training artifacts (centroids, codebooks)."""
    return _table_fingerprint(sf_dir, "embeddings")


def _gc_tmp_siblings(tmp: str, prefix: str, keep: str) -> None:
    """GC stale build artifacts under ``tmp``, called only when a NEW
    fingerprint is about to be built: ``.build-*`` orphans after one
    hour (a builder that crashed between build and rename), but
    PUBLISHED sibling dirs only after 24 h WITHOUT a serve — every
    serve touches the dir mtime (:func:`_touch_served`), so a
    long-lived session (streaming ANN serving, a gate run on another
    sf dir) that is actively reading an index built hours ago never
    has it rmtree'd out from under in-flight parquet reads."""
    import shutil

    for entry in _os.listdir(tmp):
        if entry == keep or not entry.startswith(prefix):
            continue
        full = _os.path.join(tmp, entry)
        limit = 3600 if ".build-" in entry else 86400
        try:
            if _time.time() - _os.path.getmtime(full) < limit:
                continue
        except OSError:
            continue
        shutil.rmtree(full, ignore_errors=True)


def _touch_served(path: str) -> None:
    """Bump a served artifact dir's mtime so the 24 h GC window in
    :func:`_gc_tmp_siblings` is measured from the LAST SERVE, not the
    build."""
    try:
        _os.utime(path, None)
    except OSError:
        pass


def _publish_build(build: str, path: str) -> None:
    """Atomically publish ``build`` as ``path`` via ``os.rename``.

    A losing ``rename`` is only benign when a CONCURRENT builder already
    published ``path`` — any other OSError (permissions, cross-device
    tmp, a non-local default FS so the build never landed on local disk)
    would previously be swallowed here and surface much later as a
    confusing parquet-read failure on a nonexistent path (r11 advice).
    Verify the published dir actually exists before discarding the
    build; re-raise the original error otherwise."""
    import shutil

    try:
        _os.rename(build, path)
    except OSError:
        if not _os.path.isdir(path):
            raise  # nothing was published — the rename failure is real
        shutil.rmtree(build, ignore_errors=True)  # concurrent builder won


def _ivfpq_index_path(spark: SparkSession, sf_dir: str, books) -> str:
    """Build-once path for q43's persistent IVF-PQ index: keyed by a
    CONTENT fingerprint of the corpus (file names + sizes + mtimes of
    embeddings.parquet), so regenerating the corpus at the same path
    gets a fresh index instead of silently reusing a stale one.  The
    build lands in a process-unique sibling dir and is published with
    one atomic ``os.rename`` — two concurrent builders cannot
    interleave writes into the served directory; the rename loser
    discards its copy and serves the winner's."""
    import tempfile
    import uuid

    from pride_spark.operators import ann_index

    tmp = tempfile.gettempdir()
    path = _os.path.join(tmp, f"pride_spark_ivfpq_v2_{_corpus_fingerprint(sf_dir)}")
    if not _os.path.exists(_os.path.join(path, "meta.json")):
        # GC before building: (a) '*.build-<uuid>' siblings leaked by a
        # builder that crashed between build and rename (1 h age guard —
        # a CONCURRENT builder's in-progress dir must survive until its
        # atomic rename); (b) old fingerprint dirs orphaned when the
        # corpus was regenerated (mtime_ns is part of the key, so stale
        # dirs are never served again) — these only after 24 h without a
        # serve, see _gc_tmp_siblings.
        _gc_tmp_siblings(tmp, "pride_spark_ivfpq_v2_", _os.path.basename(path))
        build_dir = path + f".build-{uuid.uuid4().hex}"
        emb = _t(spark, sf_dir, "embeddings")
        ann_index.build_ivf_index(
            emb, build_dir, "vec_id", "embedding", n_centroids=8, pq_codebooks=books
        )
        _publish_build(build_dir, path)
    _touch_served(path)
    return path


#: per-corpus-fingerprint memo of q43's BUILD-stage artifacts (IVF
#: centroids, seeded + trained codebooks, persistent index path).
#: Holds only the most recent corpus so a long-lived session that walks
#: many sf dirs doesn't accumulate centroid tables.
_Q43_BUILD_CACHE: dict[str, dict] = {}


def q43_build_artifacts(spark: SparkSession, sf_dir: str) -> dict:
    """Build/train everything q43's four searches share, once per corpus
    content fingerprint: the IVF coarse quantizer (spherical k-means
    over a bounded sample), the seeded and data-trained PQ codebooks,
    and the persistent on-disk IVF-PQ index.  This is the round-5/6
    verdict's bench-scope split — a production index is built once and
    searched many times, so the timed q43 row should measure SEARCH
    latency; bench.py runs this as a separately-timed fixture stage
    (see ``bench_fixtures``).  All artifacts are deterministic
    functions of the corpus, so memoizing them changes no result.

    The PQ CODES tables are materialized here too (one parquet per
    codebook family, atomic-rename published like the index): encoding
    is a full-corpus scan, and a served PQ index never re-encodes its
    corpus per query batch — the searches read the 16-32× narrower
    codes table instead (``pq_topk(codes_df=...)``), which at 100 TB is
    the difference between scanning compressed codes and scanning the
    float vectors every search."""
    import hashlib
    import tempfile
    import uuid

    fp = _corpus_fingerprint(sf_dir)
    cached = _Q43_BUILD_CACHE.get(fp)
    if cached is None:
        emb = _t(spark, sf_dir, "embeddings")
        books = similarity.pq_codebooks_seeded(m=_PQ_M, k=_PQ_K, dim=_PQ_DIM)
        books_t = similarity.pq_train(
            spark.read.parquet(f"{_PQ_TRAIN_DIR}/embeddings.parquet"),
            "vec_id", "embedding", m=_PQ_M, k=_PQ_K, order_by_id=True,
        )
        # codes dir keyed by corpus fingerprint + BOTH codebook digests
        # (trained books depend on the train fixture, not the corpus)
        bh = hashlib.md5(repr((books, books_t)).encode()).hexdigest()[:8]
        tmp = tempfile.gettempdir()
        codes_dir = _os.path.join(tmp, f"pride_spark_pqcodes_v1_{fp}_{bh}")
        if not _os.path.isdir(_os.path.join(codes_dir, "trained")):
            # GC stale fingerprints/builds — same serve-aware age policy
            # as _ivfpq_index_path (see _gc_tmp_siblings)
            _gc_tmp_siblings(tmp, "pride_spark_pqcodes_v1_", _os.path.basename(codes_dir))
            build = codes_dir + f".build-{uuid.uuid4().hex}"
            for fam, bks in (("seeded", books), ("trained", books_t)):
                emb.select(
                    F.col("vec_id").alias("nbr_id"),
                    similarity.pq_encode_expr("embedding", bks).alias("codes"),
                ).write.mode("overwrite").parquet(_os.path.join(build, fam))
            _publish_build(build, codes_dir)
        cached = {
            "ivf_centroids": similarity._kmeans_centroids(
                emb, "vec_id", "embedding", 8, 2
            ),
            "books_seeded": books,
            "books_trained": books_t,
            "index_path": _ivfpq_index_path(spark, sf_dir, books),
            "codes_seeded_path": _os.path.join(codes_dir, "seeded"),
            "codes_trained_path": _os.path.join(codes_dir, "trained"),
        }
        _Q43_BUILD_CACHE.clear()
        _Q43_BUILD_CACHE[fp] = cached
    # serve-touch on EVERY access (memo hits included): the 24 h GC
    # window is measured from the last serve, so another process's GC
    # can't reap a dir this session is actively reading
    _touch_served(_os.path.dirname(cached["codes_seeded_path"]))
    _touch_served(cached["index_path"])
    return cached


@register("q43_ivf_ann", _pq_oracle_sql)  # lazy: resolved on oracle_sql()
def q43_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators import ann_index

    art = q43_build_artifacts(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") < 50)
    ivf = similarity.ivf_topk(
        emb, "vec_id", "embedding", k=3, n_centroids=8, n_probe=8,
        probe=probe, centroids=art["ivf_centroids"],
    ).select(
        F.lit("ivf").alias("method"), "query_id", "nbr_id",
        F.col("cosine").alias("score"), "rank",
    )
    pq = similarity.pq_topk(
        emb, "vec_id", "embedding", art["books_seeded"], k=3, probe=probe,
        codes_df=spark.read.parquet(art["codes_seeded_path"]),
    ).select(
        F.lit("pq").alias("method"), "query_id", "nbr_id",
        F.col("adc").alias("score"), "rank",
    )
    ivfpq = ann_index.search_ivf_pq_index(
        spark, art["index_path"], probe, "vec_id", "embedding",
        # warn_low_recall off: this is the oracle-identity configuration
        # (DuckDB shortlists on the same rerank=40), not a recall claim
        k=3, n_probe=8, rerank=_PQ_RERANK, warn_low_recall=False,
    ).select(
        F.lit("ivf_pq").alias("method"), "query_id", "nbr_id",
        F.col("cosine").alias("score"), "rank",
    )
    pq_t = similarity.pq_topk(
        emb, "vec_id", "embedding", art["books_trained"], k=3, probe=probe,
        codes_df=spark.read.parquet(art["codes_trained_path"]),
    ).select(
        F.lit("pq_trained").alias("method"), "query_id", "nbr_id",
        F.col("adc").alias("score"), "rank",
    )
    return ivf.unionByName(pq).unionByName(ivfpq).unionByName(pq_t)


# NOTE: the document-fingerprint query (formerly q44_fingerprint) is folded
# into q14_token_stats — same table, same per-doc scalar shape — to stay
# inside the 50-entry driver gate cap.  rolling_fingerprint keeps its own
# pytest coverage (tests/test_dedup_similarity_text.py).


# ---------------------------------------------------------------------------
# Combined FDR score (SURVEY §2.6 ⚙; PIAModelerService.java:76) — per
# engine-combination q-values; exercises the partitioned FDR window path.
# kind='psm_sets' (round 10, same 50-entry-cap fold technique as q48/q43):
# the merged-analysis critical path — PIA's createPSMSets(true) grouping
# (group_psm_sets; PIAModelerService.java:111-114) composed with set-level
# combined FDR.  The oracle replays the full set semantics in SQL: best
# member by (score DESC, file, psmId), all-decoy vote, sorted-distinct
# engine key, then the same interpolated-FDR chain PARTITIONED BY
# (kind, engineSet).
# ---------------------------------------------------------------------------


def _q45_psms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem as a three-result-file merged submission — (spectrumKey,
    sequence, charge) collide across fileName values, so group_psm_sets
    exercises real multi-member sets."""
    return _t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("f"), (F.col("l_linenumber") % 3).cast("string")).alias(
            "fileName"
        ),
        F.col("l_orderkey").alias("spectrumKey"),
        F.concat(F.lit("P"), (F.col("l_partkey") % 10).cast("string")).alias(
            "peptideSequence"
        ),
        (F.lit(2) + F.col("l_suppkey") % 2).cast("int").alias("precursorCharge"),
        F.col("l_extendedprice").alias("score"),
        (F.col("l_returnflag") == "R").alias("isDecoy"),
        F.concat(F.lit("eng"), (F.col("l_suppkey") % 3).cast("string")).alias(
            "scoreAccession"
        ),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("psmId"),
    )


def q45_sets_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once materialization of q45's PSM-set table (r10 verdict
    task #5, the q43 bench-scope split applied to FDR): a merged
    reanalysis groups its PSM sets once and then runs MANY set-level FDR
    chains over them, so the timed q45 row should measure the FDR
    chains, not re-derive the 600k-row set grouping per run.  Keyed by a
    content fingerprint of lineitem, published with one atomic rename
    (two concurrent builders cannot interleave; loser serves the
    winner's), GC'd by the same serve-aware policy as q43's artifacts."""
    import tempfile
    import uuid

    from pride_spark.operators.fdr import group_psm_sets

    tmp = tempfile.gettempdir()
    fp = _table_fingerprint(sf_dir, "lineitem")
    path = _os.path.join(tmp, f"pride_spark_q45sets_v1_{fp}")
    if not _os.path.isdir(path):
        _gc_tmp_siblings(tmp, "pride_spark_q45sets_v1_", _os.path.basename(path))
        build = path + f".build-{uuid.uuid4().hex}"
        group_psm_sets(
            _q45_psms(spark, sf_dir),
            spectrum_key_col="spectrumKey",
            consider_modifications=False,
        ).write.mode("overwrite").parquet(build)
        _publish_build(build, path)
    _touch_served(path)
    return path
@register(
    "q45_combined_fdr",
    """
    WITH psms AS (
      SELECT 'f' || CAST(l_linenumber % 3 AS VARCHAR) AS fileName,
             l_orderkey AS spectrumKey,
             'P' || CAST(l_partkey % 10 AS VARCHAR) AS seq,
             2 + l_suppkey % 2 AS charge,
             l_extendedprice AS score,
             (l_returnflag = 'R') AS isDecoy,
             'eng' || CAST(l_suppkey % 3 AS VARCHAR) AS engine,
             l_orderkey * 10 + l_linenumber AS psmId
      FROM lineitem
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY spectrumKey, seq, charge
                                ORDER BY score DESC, fileName, psmId) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY spectrumKey, seq, charge)
                  AS INTEGER) AS setSize,
             BOOL_AND(isDecoy) OVER (PARTITION BY spectrumKey, seq, charge)
               AS setDecoy
      FROM psms
    ), engines AS (
      SELECT spectrumKey, seq, charge,
             ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT engine)), ';') AS engineSet
      FROM psms GROUP BY 1, 2, 3
    ), sets AS (
      SELECT r.psmId AS key, e.engineSet, r.score, r.setDecoy AS isDecoy,
             r.setSize
      FROM ranked r JOIN engines e USING (spectrumKey, seq, charge)
      WHERE r.rn = 1
    ), scored AS (
      SELECT 'orders' AS kind, o_orderkey AS key,
             o_orderpriority AS engineSet,
             o_totalprice AS score,
             (o_orderstatus = 'F') AS isDecoy,
             CAST(NULL AS INTEGER) AS setSize
      FROM orders
      UNION ALL
      SELECT 'psm_sets', key, engineSet, score, isDecoy, setSize FROM sets
    ), cume AS (
      SELECT kind, key, engineSet, score, isDecoy, setSize,
        SUM(CASE WHEN isDecoy THEN 1 ELSE 0 END) OVER w AS cd,
        SUM(CASE WHEN isDecoy THEN 0 ELSE 1 END) OVER w AS ct
      FROM scored
      WINDOW w AS (PARTITION BY kind, engineSet ORDER BY score DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), f AS (
      SELECT kind, key, engineSet, score, isDecoy, setSize,
             cd / GREATEST(ct, 1) AS fdr
      FROM cume
    ), q AS (
      SELECT kind, key, engineSet, score, isDecoy, setSize,
             MIN(fdr) OVER (PARTITION BY kind, engineSet ORDER BY score DESC
                            RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS qv
      FROM f
    ), marked AS (
      SELECT *,
             CASE WHEN LAG(qv) OVER w IS NULL OR qv > LAG(qv) OVER w
                  THEN 1 ELSE 0 END AS is_step
      FROM q
      WINDOW w AS (PARTITION BY kind, engineSet ORDER BY score DESC)
    ), stepped AS (
      SELECT *,
             CASE WHEN is_step = 1 THEN score END AS sx,
             CASE WHEN is_step = 1 THEN qv END AS sq
      FROM marked
    ), bounds AS (
      SELECT *,
             LAST_VALUE(sx IGNORE NULLS) OVER wf AS px,
             LAST_VALUE(sq IGNORE NULLS) OVER wf AS pq,
             LAST_VALUE(sx IGNORE NULLS) OVER wb AS nx,
             LAST_VALUE(sq IGNORE NULLS) OVER wb AS nq
      FROM stepped
      WINDOW
        -- RANGE, not ROWS: tie-stable knot visibility (all score-peers in
        -- frame; the one non-null step struct per group wins IGNORE NULLS
        -- regardless of intra-tie order) — mirrors fdr.combined_fdr_score
        wf AS (PARTITION BY kind, engineSet ORDER BY score DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wb AS (PARTITION BY kind, engineSet ORDER BY score ASC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT kind, key, engineSet, isDecoy, setSize,
           CASE WHEN px IS NULL OR nx IS NULL OR nx = px THEN qv
                ELSE pq + (nq - pq) * ((score - px) / (nx - px)) END
             AS combinedFdrScore
    FROM bounds
    """,
)
def q45_combined_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.fdr import combined_fdr_score

    # kind='orders': the original per-engine-set interpolated FDR
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("engineSet"),
        F.col("o_totalprice").alias("score"),
        (F.col("o_orderstatus") == "F").alias("isDecoy"),
    )
    orders_part = combined_fdr_score(o, "score", "isDecoy", "engineSet").select(
        F.lit("orders").alias("kind"),
        F.col("o_orderkey").alias("key"),
        "engineSet",
        "isDecoy",
        F.lit(None).cast("int").alias("setSize"),
        "combinedFdrScore",
    )
    # kind='psm_sets': the set table is a BUILD-stage fixture
    # (q45_sets_path — materialized once per corpus, like q43's index);
    # the timed row measures the set-level combined-FDR chains over the
    # prebuilt sets — exactly the createPSMSets(true) composition with
    # the grouping cost where a served reanalysis pays it: once.
    sets = spark.read.parquet(q45_sets_path(spark, sf_dir))
    sets_part = combined_fdr_score(sets, "score", "isDecoy", "engineSet").select(
        F.lit("psm_sets").alias("kind"),
        F.col("psmId").alias("key"),
        "engineSet",
        "isDecoy",
        F.col("setSize").cast("int").alias("setSize"),
        "combinedFdrScore",
    )
    return orders_part.unionByName(sets_part)


# ---------------------------------------------------------------------------
# Retention-time fallback (SURVEY §2.10 C13; PrideAnalysisAssayService.java:
# 631-644) — psm.rt else first MS:1000016 CvParam, exercised on events.
# ---------------------------------------------------------------------------
@register(
    "q46_rt_fallback",
    f"""
    SELECT 'rt' AS kind, event_id,
           COALESCE(CASE WHEN event_type = 'error' THEN NULL ELSE value END,
                    CASE WHEN user_id % 3 = 0 THEN CAST(user_id AS DOUBLE) END)
             AS retentionTime,
           CAST(NULL AS VARCHAR) AS day,
           CAST(NULL AS BIGINT) AS n_transit,
           CAST(NULL AS DOUBLE) AS qty_sum
    FROM events
    UNION ALL
    SELECT 'transit', NULL, NULL, STRFTIME(d.day, '%Y-%m-%d'), COUNT(*),
           {_dsum_sql('l_quantity')}
    FROM (SELECT DISTINCT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS day
          FROM orders) d
    JOIN lineitem
      ON d.day BETWEEN l_shipdate
                   AND l_shipdate + (1 + l_partkey % 30) * INTERVAL 1 DAY
    GROUP BY d.day
    """,
)
def q46_rt_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RT fallback (C13) + range join (operators.joins.range_join — the
    brief's named point-in-interval operator, folded under the 50-entry
    cap).  kind='transit' counts lineitems in transit (shipped, not yet
    received) on each month-start date via the BINNED range join — the
    oracle states the naive BETWEEN join; only results must agree."""
    from pride_spark.functions.misc import retention_time_fallback
    from pride_spark.operators.joins import range_join

    e = _t(spark, sf_dir, "events")
    rt_expr = F.when(
        F.col("event_type") == "error", F.lit(None).cast("double")
    ).otherwise(F.col("value"))
    cv = F.array(
        F.struct(
            F.when(F.col("user_id") % 3 == 0, F.lit("MS:1000016"))
            .otherwise(F.lit("MS:1000894"))
            .alias("accession"),
            F.col("user_id").cast("string").alias("value"),
        )
    )
    rt = e.select(
        F.lit("rt").alias("kind"),
        "event_id",
        retention_time_fallback(rt_expr, cv, nan_default=False).alias("retentionTime"),
        F.lit(None).cast("string").alias("day"),
        F.lit(None).cast("long").alias("n_transit"),
        F.lit(None).cast("double").alias("qty_sum"),
    )

    epoch = F.to_date(F.lit("1970-01-01"))
    pts = (
        _t(spark, sf_dir, "orders")
        .select(F.trunc("o_orderdate", "month").alias("day"))
        .distinct()
        .withColumn("x", F.datediff("day", epoch))
    )
    # the fixture lineitem carries no receipt date; derive one
    # deterministically (ship + 1..30 days keyed on l_partkey)
    iv = (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_quantity",
            F.datediff("l_shipdate", epoch).alias("s"),
            (
                F.datediff("l_shipdate", epoch)
                + 1
                + F.pmod(F.col("l_partkey"), F.lit(30))
            ).alias("e"),
        )
    )
    # TPC-H receipt dates trail ship dates by 1-30 days: bin_width=32
    # keeps interval replication under 2x
    transit = (
        range_join(pts, iv, "x", "s", "e", bin_width=32)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_transit"), _dsum("l_quantity").alias("qty_sum"))
        .select(
            F.lit("transit").alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("retentionTime"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_transit",
            "qty_sum",
        )
    )
    return rt.unionByName(transit)


# ---------------------------------------------------------------------------
# Connected components (SURVEY §2.14b clustering core) — chains of
# consecutive same-customer orders; label = min orderkey reachable.  The
# oracle needs no recursion: a chain's transitive closure is the customer
# group, but the ENGINE only sees consecutive-pair edges, so it must
# propagate labels across the full chain diameter to agree.
# ---------------------------------------------------------------------------
@register(
    "q47_connected_components",
    """
    SELECT o_orderkey AS node,
           MIN(o_orderkey) OVER (PARTITION BY o_custkey) AS component
    FROM orders
    QUALIFY COUNT(*) OVER (PARTITION BY o_custkey) > 1
    """,
)
def q47_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.graph import connected_components

    o = _t(spark, sf_dir, "orders")
    # consecutive orders per customer chain-link via lag over ONE window
    # pass — a rank self-join would shuffle the table twice for the same
    # edge list
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    edges = o.select(
        F.lag("o_orderkey").over(w).alias("src"), F.col("o_orderkey").alias("dst")
    ).filter(F.col("src").isNotNull())
    # chain-link edges bound every component by one customer's order
    # count — a data contract that rules out hubs, so the auto-probe
    # machinery (the library default) is pure overhead here
    return connected_components(edges, skew_safe=False)


# ---------------------------------------------------------------------------
# Native spectral clustering (SURVEY §2.14b) — the in-engine MaraCluster
# substitute.  Spectra are synthesized from the embeddings table (dims →
# quantized fragment pattern), so same-label embedding rows cluster.  The
# query gates BOTH candidate modes in one row (a `method` column keeps
# the driver's 50-entry budget): the deterministic exhaustive
# within-block mode (``method="block"``, the exact baseline) AND the
# PRODUCTION minhash-banding mode users run at scale
# (``method="lsh"``), made oracle-able via ``hash_fn="md5"`` — 8-hex
# chunked-md5 minhashes + md5 band digests, the q24 technique — so
# DuckDB reproduces the exact bucket assignment, first-collision pair
# emission, Jaccard gate, and connected components.  Ref capability:
# /root/reference/submissions.nf:245-269 (MaraCluster boundary).
# ---------------------------------------------------------------------------
@register(
    "q48_spectral_cluster",
    """
    WITH RECURSIVE base AS (
      SELECT CAST(vec_id AS VARCHAR) AS key,
             400e0 + (vec_id % 50) * 4e0 AS pmz,
             LIST_SORT(LIST_DISTINCT(LIST_TRANSFORM(embedding[1:24],
               (x, i) -> CAST(FLOOR((100e0 + (i-1)*13.7e0 + CAST(x AS DOUBLE)*2e0)
                                    / 1.0005e0 + 0.5e0) AS BIGINT)))) AS bins
      FROM embeddings
    ),
    blocked AS (
      SELECT key, bins,
             UNNEST(LIST_DISTINCT([CAST(FLOOR(pmz/2e0) AS BIGINT),
                                   CAST(FLOOR(pmz/2e0 + 0.5e0) AS BIGINT)])) AS pblock
      FROM base
    ),
    cand AS (
      SELECT DISTINCT a.key AS ka, b.key AS kb, a.bins AS ba, b.bins AS bb
      FROM blocked a JOIN blocked b USING (pblock)
      WHERE a.key < b.key
    ),
    pairs AS (
      SELECT ka, kb FROM cand
      WHERE LEN(LIST_INTERSECT(ba, bb))
            / (LEN(ba) + LEN(bb) - LEN(LIST_INTERSECT(ba, bb))) >= 0.5e0
    ),
    edges AS (SELECT ka AS src, kb AS dst FROM pairs
              UNION ALL SELECT kb, ka FROM pairs),
    reach(node, lbl) AS (
      SELECT key, key FROM base
      UNION
      SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
    ),
    sigd AS (
      -- 16 chunked-md5 minhashes: value s = 8-hex chunk s%4 of
      -- MD5((s//4) || '|' || bin), mirroring spectral_cluster hash_fn="md5"
      SELECT key, bins,
             [LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('0|' || CAST(x AS VARCHAR)), 1, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('0|' || CAST(x AS VARCHAR)), 9, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('0|' || CAST(x AS VARCHAR)), 17, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('0|' || CAST(x AS VARCHAR)), 25, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('1|' || CAST(x AS VARCHAR)), 1, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('1|' || CAST(x AS VARCHAR)), 9, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('1|' || CAST(x AS VARCHAR)), 17, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('1|' || CAST(x AS VARCHAR)), 25, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('2|' || CAST(x AS VARCHAR)), 1, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('2|' || CAST(x AS VARCHAR)), 9, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('2|' || CAST(x AS VARCHAR)), 17, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('2|' || CAST(x AS VARCHAR)), 25, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('3|' || CAST(x AS VARCHAR)), 1, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('3|' || CAST(x AS VARCHAR)), 9, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('3|' || CAST(x AS VARCHAR)), 17, 8))),
              LIST_MIN(LIST_TRANSFORM(bins, x -> SUBSTR(MD5('3|' || CAST(x AS VARCHAR)), 25, 8)))
             ] AS sig,
             LIST_DISTINCT([CAST(FLOOR(pmz/2e0) AS BIGINT),
                            CAST(FLOOR(pmz/2e0 + 0.5e0) AS BIGINT)]) AS pbs
      FROM base
    ),
    digd AS (
      -- 8 bands × 2 rows: band digest = md5 of the comma-joined slice
      SELECT key, bins, pbs,
             LIST_TRANSFORM([0, 1, 2, 3, 4, 5, 6, 7],
               b -> MD5(ARRAY_TO_STRING(LIST_SLICE(sig, b * 2 + 1, b * 2 + 2), ','))) AS digs
      FROM sigd
    ),
    lsh_blocked AS (
      SELECT key, bins, digs, UNNEST(pbs) AS pblock FROM digd
    ),
    banded0 AS (
      SELECT key, bins, pblock, digs, UNNEST([0, 1, 2, 3, 4, 5, 6, 7]) AS band
      FROM lsh_blocked
    ),
    banded AS (
      SELECT key, bins, pblock, band, digs[band + 1] AS bandHash FROM banded0
    ),
    lsh_cand AS (
      -- DISTINCT over all bucket meetings = the engine's uncapped
      -- first-collision pair set
      SELECT DISTINCT a.key AS ka, b.key AS kb, a.bins AS ba, b.bins AS bb
      FROM banded a JOIN banded b USING (pblock, band, bandHash)
      WHERE a.key < b.key
    ),
    lsh_pairs AS (
      SELECT ka, kb FROM lsh_cand
      WHERE LEN(LIST_INTERSECT(ba, bb))
            / (LEN(ba) + LEN(bb) - LEN(LIST_INTERSECT(ba, bb))) >= 0.5e0
    ),
    lsh_edges AS (SELECT ka AS src, kb AS dst FROM lsh_pairs
                  UNION ALL SELECT kb, ka FROM lsh_pairs),
    lsh_reach(node, lbl) AS (
      SELECT key, key FROM base
      UNION
      SELECT e.dst, r.lbl FROM lsh_reach r JOIN lsh_edges e ON e.src = r.node
    )
    SELECT 'block' AS method, node AS usi, MIN(lbl) AS clusterId
    FROM reach GROUP BY node
    UNION ALL
    SELECT 'lsh' AS method, node AS usi, MIN(lbl) AS clusterId
    FROM lsh_reach GROUP BY node
    """,
)
def q48_spectral_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q48_cluster(spark, sf_dir, ("block", "lsh"))


#: per-corpus-fingerprint memo of q48's duplication-probe verdict — the
#: probe is a corpus STATISTIC (like q43's centroids/codebooks), so a
#: long-lived session pays its one extra job once per corpus, not once
#: per query run.  Purely a performance flag: collapse on/off produces
#: identical labels (spectral_cluster._rep_collapse's proof).
_Q48_COLLAPSE_FLAG: dict[str, bool] = {}


def _q48_spectra(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT widened (r13): the binning work is amortized across the
    # clusterer's persisted reuse, and an A/B of _tw here read 1.06x —
    # the CC loop's fixed round cost dominates q48, not the scan stage
    emb = _t(spark, sf_dir, "embeddings")
    dims = F.slice(F.col("embedding"), 1, 24)
    return emb.select(
        F.col("vec_id").cast("string").alias("usi"),
        (400.0 + F.pmod(F.col("vec_id"), F.lit(50)) * 4.0).alias("precursorMz"),
        F.transform(
            dims, lambda x, i: (100.0 + i * 13.7 + x * 2.0).cast("double")
        ).alias("masses"),
        F.transform(dims, lambda x: F.abs(x) * 100.0 + 1.0).alias("intensities"),
    )


def _q48_collapse_flag(spark: SparkSession, sf_dir: str) -> bool:
    from pride_spark.operators.spectral_cluster import _binned_frame, _has_duplicates

    fp = _corpus_fingerprint(sf_dir)
    if fp not in _Q48_COLLAPSE_FLAG:
        base = _binned_frame(
            _q48_spectra(spark, sf_dir), "usi", "masses", "intensities",
            "precursorMz", 24, 1.0005,
        )
        _Q48_COLLAPSE_FLAG.clear()
        _Q48_COLLAPSE_FLAG[fp] = _has_duplicates(base)
    return _Q48_COLLAPSE_FLAG[fp]


def _q48_cluster(spark: SparkSession, sf_dir: str, methods) -> DataFrame:
    from pride_spark.operators.spectral_cluster import cluster_spectra_multi

    spectra = _q48_spectra(spark, sf_dir)
    # one shared binning/signature pass + ONE connected-components run over
    # the tagged disjoint union of all requested methods' edges — half the
    # CC fixed cost of two cluster_spectra calls (bench: 8.9s -> BENCH_r04)
    return cluster_spectra_multi(
        spectra, "usi", methods=tuple(methods), top_k=24, threshold=0.5,
        hash_fn="md5", collapse_duplicates=_q48_collapse_flag(spark, sf_dir),
    ).select("method", F.col("key").alias("usi"), "clusterId")


def q48_production_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q48's PRODUCTION path in isolation: banded-LSH candidate
    generation only — the O(bucket²) exact block baseline (gate scope,
    `spectral_cluster.py` block mode) never runs.  This is the variant
    the sf1 scale gate times against the ≤12 s factor-10 bar; the
    registry row keeps both methods because the block mode is the
    oracle-grade exactness baseline the LSH path is judged against."""
    return _q48_cluster(spark, sf_dir, ("lsh",))


def q48_production_lsh_oracle_sql() -> str:
    """The lsh half of q48's oracle — the registry SQL with the block
    branch filtered out (DuckDB prunes the UNION ALL branch under the
    constant-false predicate)."""
    sql = oracle_sql()["q48_spectral_cluster"]
    return f"SELECT * FROM ({sql}) WHERE method = 'lsh'"


# ---------------------------------------------------------------------------
# Hyperplane-LSH ANN (north-star similarity, scale path).  The planes are
# seeded literals so the DuckDB oracle reproduces the exact bucket
# assignment: bucket = sum of sign bits of plane dot products, candidates
# restricted to same-(table, bucket) pairs, OR-construction over two
# 4-plane tables, then exact cosine rank within candidates.  Both engines
# fold the dot product left-to-right in double, so the sign bits agree.
# ---------------------------------------------------------------------------
def _lsh_planes(tables: int = 2, bits: int = 4, dim: int = 64) -> list[list[list[float]]]:
    """Deterministic pseudo-random hyperplanes (LCG, 4dp literals)."""
    state = 20250813
    out = []
    for _ in range(tables):
        tbl = []
        for _ in range(bits):
            p = []
            for _ in range(dim):
                state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
                p.append(round(state / float(1 << 63) * 2.0 - 1.0, 4))
            tbl.append(p)
        out.append(tbl)
    return out


def _lsh_oracle_sql() -> str:
    tables = _lsh_planes()
    selects = []
    for t, tbl in enumerate(tables):
        bits = " + ".join(
            f"CASE WHEN LIST_INNER_PRODUCT(v, {plane!r}) >= 0 THEN {1 << i} ELSE 0 END"
            for i, plane in enumerate(tbl)
        )
        selects.append(f"SELECT vec_id, v, {t} AS t, ({bits}) AS bucket FROM e")
    union = "\n      UNION ALL\n      ".join(selects)
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    h AS (
      {union}
    ),
    pairs AS (
      SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS nbr_id
      FROM h a JOIN h b ON a.t = b.t AND a.bucket = b.bucket
      WHERE a.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT query_id, nbr_id,
             ROUND(LIST_INNER_PRODUCT(qa.v, qb.v) /
                   (SQRT(LIST_INNER_PRODUCT(qa.v, qa.v)) *
                    SQRT(LIST_INNER_PRODUCT(qb.v, qb.v))), 6) AS cosine
      FROM pairs
      JOIN e qa ON qa.vec_id = query_id
      JOIN e qb ON qb.vec_id = nbr_id
    )
    SELECT query_id, nbr_id, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, nbr_id) AS rank
      FROM scored
    ) WHERE rank <= 3
    """


@register("q49_lsh_ann", _lsh_oracle_sql())
def q49_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    # default scorer is the per-bucket GEMM path (similarity.lsh_topk_gemm):
    # one float64 BLAS matmul per (table, bucket) Arrow batch, only top-k
    # rows cross the Python/JVM boundary — ~4.5x the all-JVM fold variant
    # (lsh_topk_fold, kept for bit-parity and asserted equivalent in
    # tests/test_dedup_similarity_text.py::test_lsh_gemm_matches_fold_path).
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(emb, "vec_id", "embedding", planes=_lsh_planes(), k=3)


# ---------------------------------------------------------------------------
# Audio waveform features + video frame sampling (north-star multimodal,
# audio + video modalities) in one gate row — one UNION-shaped query so
# both Arrow kernels stay driver-value-checked within the 50-entry cap
# (formerly q50_audio_features + q51_video_frames).
#
# Audio: same Arrow mapInPandas plumbing as q38; the stub decode (payload
# bytes as signed 8-bit PCM) is deterministic arithmetic, so DuckDB
# reproduces the sample count, integer RMS and zero-crossing count exactly
# from the UTF-8 payload bytes.  Video: the 1→N mapInPandas explode (one
# row per sampled frame) is the plumbing a real ffmpeg kernel would use;
# the stub frame is a deterministic byte slice, so DuckDB reproduces each
# frame as a hex substring of the payload.
# ---------------------------------------------------------------------------
@register(
    "q50_media_features",
    """
    WITH au AS (
      SELECT doc_id AS media_id, ENCODE(text) AS p
      FROM documents WHERE doc_id % 3 = 1
    ),
    b AS (SELECT media_id, HEX(p) AS fh, OCTET_LENGTH(p) AS n FROM au),
    w AS (
      SELECT media_id, n,
        LIST_TRANSFORM(GENERATE_SERIES(1, n),
          i -> CASE WHEN ('0x'||SUBSTR(fh,2*i-1,2))::INT > 127
                    THEN ('0x'||SUBSTR(fh,2*i-1,2))::INT - 256
                    ELSE ('0x'||SUBSTR(fh,2*i-1,2))::INT END) AS sb
      FROM b
    ),
    audio AS (
      SELECT media_id,
             CAST(n AS INT) AS n_samples,
             CAST(CASE WHEN n = 0 THEN 0
                       ELSE TRUNC(SQRT(LIST_SUM(LIST_TRANSFORM(sb, x -> x*x))::DOUBLE
                                       / n)) END AS INT) AS rms,
             CAST(COALESCE(LEN(LIST_FILTER(GENERATE_SERIES(1, n-1),
                      i -> (sb[i] < 0) != (sb[i+1] < 0))), 0) AS INT) AS zero_crossings
      FROM w
    ),
    vid AS (
      SELECT doc_id AS media_id, ENCODE(text) AS p, n_chars
      FROM documents WHERE doc_id % 3 = 2
    ),
    vb AS (SELECT media_id, HEX(p) AS fh,
                  GREATEST(CAST((n_chars * 10) // 5000 AS INT), 1) AS nf
           FROM vid),
    video AS (
      SELECT media_id,
             CAST(i - 1 AS INT) AS frame_idx,
             SUBSTR(fh, 2*(i-1)+1, 32) AS frame_hex
      FROM vb, UNNEST(GENERATE_SERIES(1, nf)) AS g(i)
    )
    SELECT 'audio' AS modality, media_id, n_samples, rms, zero_crossings,
           CAST(NULL AS INT) AS frame_idx, CAST(NULL AS VARCHAR) AS frame_hex
    FROM audio
    UNION ALL
    SELECT 'video' AS modality, media_id,
           CAST(NULL AS INT) AS n_samples, CAST(NULL AS INT) AS rms,
           CAST(NULL AS INT) AS zero_crossings, frame_idx, frame_hex
    FROM video
    """,
)
def q50_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators import multimodal as mm

    docs = _t(spark, sf_dir, "documents")
    media = mm.synthesize_media_from_documents(docs)
    audio = mm.audio_features(media).select(
        F.lit("audio").alias("modality"),
        "media_id",
        "n_samples",
        "rms",
        "zero_crossings",
        F.lit(None).cast("int").alias("frame_idx"),
        F.lit(None).cast("string").alias("frame_hex"),
    )
    video = mm.sample_frames(media, every_ms=5000).select(
        F.lit("video").alias("modality"),
        "media_id",
        F.lit(None).cast("int").alias("n_samples"),
        F.lit(None).cast("int").alias("rms"),
        F.lit(None).cast("int").alias("zero_crossings"),
        "frame_idx",
        F.upper(F.hex(F.col("frame"))).alias("frame_hex"),
    )
    return audio.unionByName(video)


# ---------------------------------------------------------------------------
# Temporal joins over events, one union-shaped gate row (the q50 fold
# pattern, keeping the 50-entry driver cap):
#
# - kind='range'       — stream-stream time-range join (SURVEY §2.12
#   extension; pride_spark.streaming.joins.correlate_event_pairs).  Same
#   body serves readStream (watermark-bounded state) and this batch oracle
#   (equi-key sort-merge join + range post-filter).
# - kind='asof_back'   — operators.joins.asof_join backward with ``by``
#   keys AND ``tolerance`` (pandas merge_asof semantics); DuckDB's native
#   ASOF LEFT JOIN (>= , backward-inclusive) is the oracle, tolerance as a
#   post-CASE.  Right keys are pre-aggregated unique per (user_id, ts) so
#   tie rules cannot diverge between engines.
# - kind='asof_fwd'    — the forward carry (the descending running frame —
#   the path that replaced the O(n²) currentRow→unboundedFollowing frame);
#   oracled as backward ASOF over the NEGATED key.
# - kind='asof_global' — NO ``by`` keys: the two-pass range-bucket path
#   (quantile buckets + driver edge-seed prefix scan, no single-task
#   window); oracled as an ASOF join with no equi condition.
# ---------------------------------------------------------------------------
@register(
    "q52_stream_stream_join",
    """
    WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                      EPOCH_US(CAST(ts AS TIMESTAMP)) AS ts_us, user_id, event_type
               FROM events),
    rngj AS (
      SELECT a.user_id AS user_id,
             a.event_id AS trigger_id,
             b.event_id AS outcome_id,
             EPOCH_US(b.ts) - EPOCH_US(a.ts) AS latency_us
      FROM e a JOIN e b
        ON a.user_id = b.user_id
       AND a.event_type = 'click' AND b.event_type = 'purchase'
       AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
    ),
    clicks AS (SELECT user_id, event_id AS trigger_id, ts_us
               FROM e WHERE event_type = 'click'),
    errs AS (SELECT user_id, ts_us, MAX(event_id) AS outcome_id
             FROM e WHERE event_type = 'error' GROUP BY user_id, ts_us),
    backj AS (
      SELECT c.user_id, c.trigger_id,
             CASE WHEN c.ts_us - r.ts_us <= 1800000000 THEN r.outcome_id END AS outcome_id,
             CASE WHEN c.ts_us - r.ts_us <= 1800000000 THEN c.ts_us - r.ts_us END AS latency_us
      FROM clicks c ASOF LEFT JOIN errs r
        ON c.user_id = r.user_id AND c.ts_us >= r.ts_us
    ),
    fwdj AS (
      SELECT c.user_id, c.trigger_id, r.outcome_id,
             (-r.nts) - c.ts_us AS latency_us
      FROM (SELECT user_id, trigger_id, ts_us, -ts_us AS nts FROM clicks) c
      ASOF LEFT JOIN (SELECT user_id, -ts_us AS nts, outcome_id FROM errs) r
        ON c.user_id = r.user_id AND c.nts >= r.nts
    ),
    sgn AS (SELECT ts_us, MAX(event_id) AS outcome_id
            FROM e WHERE event_type = 'signup' GROUP BY ts_us),
    glbj AS (
      SELECT c.user_id, c.trigger_id, r.outcome_id,
             c.ts_us - r.ts_us AS latency_us
      FROM clicks c ASOF LEFT JOIN sgn r ON c.ts_us >= r.ts_us
    )
    SELECT 'range' AS kind, user_id, trigger_id, outcome_id, latency_us FROM rngj
    UNION ALL
    SELECT 'asof_back', user_id, trigger_id, outcome_id, latency_us FROM backj
    UNION ALL
    SELECT 'asof_fwd', user_id, trigger_id, outcome_id, latency_us FROM fwdj
    UNION ALL
    SELECT 'asof_global', user_id, trigger_id, outcome_id, latency_us FROM glbj
    """,
)
def q52_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pride_spark.operators.joins import asof_join
    from pride_spark.streaming.joins import correlate_event_pairs

    ev = _events(spark, sf_dir)
    # epoch micros regardless of whether ts surfaced as TIMESTAMP (legacy
    # nanos bigint, converted by _events) or TIMESTAMP_NTZ (current
    # micros parquet) — unix_micros rejects NTZ, timestampdiff takes both.
    if dict(ev.dtypes).get("ts") == "timestamp_ntz":
        ts_us = F.expr(
            "timestampdiff(MICROSECOND, CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), ts)"
        )
    else:
        ts_us = F.unix_micros(F.col("ts"))
    evu = ev.withColumn("ts_us", ts_us)

    out_cols = ["kind", "user_id", "trigger_id", "outcome_id", "latency_us"]

    rng = correlate_event_pairs(ev, ev, streaming=False).select(
        F.lit("range").alias("kind"), "user_id", "trigger_id", "outcome_id", "latency_us"
    )

    clicks = evu.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("trigger_id"), "ts_us"
    )
    errs = evu.filter(F.col("event_type") == "error").groupBy("user_id", "ts_us").agg(
        F.max("event_id").alias("outcome_id")
    )

    back = asof_join(
        clicks, errs, on="ts_us", by=["user_id"],
        direction="backward", tolerance=1_800_000_000,
    ).select(
        F.lit("asof_back").alias("kind"), "user_id", "trigger_id", "outcome_id",
        (F.col("ts_us") - F.col("__asof_ts_us")).alias("latency_us"),
    )
    fwd = asof_join(
        clicks, errs, on="ts_us", by=["user_id"], direction="forward",
    ).select(
        F.lit("asof_fwd").alias("kind"), "user_id", "trigger_id", "outcome_id",
        (F.col("__asof_ts_us") - F.col("ts_us")).alias("latency_us"),
    )
    sgn = evu.filter(F.col("event_type") == "signup").groupBy("ts_us").agg(
        F.max("event_id").alias("outcome_id")
    )
    glb = asof_join(clicks, sgn, on="ts_us", direction="backward").select(
        F.lit("asof_global").alias("kind"), "user_id", "trigger_id", "outcome_id",
        (F.col("ts_us") - F.col("__asof_ts_us")).alias("latency_us"),
    )
    return (
        rng.select(out_cols)
        .unionByName(back.select(out_cols))
        .unionByName(fwd.select(out_cols))
        .unionByName(glb.select(out_cols))
    )


# NOTE: the GEMM-scored LSH variant (formerly q53_lsh_ann_gemm, same oracle
# as q49) is now q49's default path — the registry is capped at 50 entries
# because the round-2 driver gate recorded exactly 50 of 53 registered
# queries (a driver-side cap; q51-q53 passed tools/check_oracle.py locally
# but got no CORRECTNESS rows).  The fold scorer stays pytest-covered.
