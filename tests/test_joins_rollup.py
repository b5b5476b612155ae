"""Join + rollup operator tests (SURVEY §2.4–§2.6)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pride_spark.operators.joins import (
    contains_first_match,
    positional_zip_join,
    psm_spectrum_join,
    semi_join_members,
)
from pride_spark.operators.rollup import (
    distinguishable_categories,
    explode_protein_accessions,
    protein_rollup,
)


def test_contains_first_match_blocked_equals_nested(spark):
    probe = spark.createDataFrame(
        [(1, "run01"), (2, "run02"), (3, "run99")], "pid long, base string"
    )
    dim = spark.createDataFrame(
        [("A", "data_RUN01.mzML"), ("B", "run01-copy.mgf"), ("C", "xxRun02.mzML")],
        "facc string, fileName string",
    )
    kw = dict(probe_text="base", dim_text="fileName", probe_keys=("pid",), order_cols=("facc",))
    nested = {(r["pid"], r["facc"]) for r in contains_first_match(probe, dim, **kw).collect()}
    blocked = {
        (r["pid"], r["facc"])
        for r in contains_first_match(probe, dim, block_lengths=[5], **kw).collect()
    }
    assert nested == blocked == {(1, "A"), (2, "C")}  # first match by facc; run99 unmatched


def test_psm_spectrum_join(spark):
    psms = spark.createDataFrame(
        [("p1", "f1", "10"), ("p2", "f1", "99"), ("p3", "f2", "10")],
        "psmId string, fileName string, spectrumKey string",
    )
    spectra = spark.createDataFrame(
        [("f1", "10", 2), ("f2", "10", 2)], "fileName string, spectrumKey string, msLevel int"
    )
    got = {r["psmId"] for r in psm_spectrum_join(psms, spectra).collect()}
    assert got == {"p1", "p3"}  # p2 has no spectrum → dropped (inner)


def test_positional_zip_join(spark):
    left = spark.createDataFrame([("c", 30), ("a", 10), ("b", 20)], "k string, v int")
    right = spark.createDataFrame([(0, "first"), (2, "third")], "idx int, tag string")
    got = {
        (r["k"], r["tag"])
        for r in positional_zip_join(left, right, left_order=("k",), right_index_col="idx").collect()
    }
    assert got == {("a", "first"), ("c", "third")}


def test_positional_zip_join_date_key(spark):
    # date/timestamp_ntz are bucketable but cannot cast straight to double
    # — regression: the bucket key must route through timestamp
    import datetime as dt

    left = spark.createDataFrame(
        [(dt.date(2020, 1, d), f"L{d}") for d in (3, 1, 2)], "day date, lv string"
    )
    right = spark.createDataFrame([(0, "first"), (2, "third")], "idx int, tag string")
    got = {
        (r["lv"], r["tag"])
        for r in positional_zip_join(
            left, right, left_order=("day",), right_index_col="idx",
            num_range_partitions=2,
        ).collect()
    }
    assert got == {("L1", "first"), ("L3", "third")}


def test_positional_zip_join_distributed(spark):
    # k = id*37 mod 1000 is a permutation of 0..999, so the row with k=j is
    # the j-th row in k-order: the zip must align k with idx exactly.
    left = spark.range(1000).select(
        ((F.col("id") * 37) % 1000).alias("k"), F.col("id").alias("v")
    ).repartition(8)
    right = spark.range(1000).select(
        F.col("id").cast("int").alias("idx"), F.concat(F.lit("t"), "id").alias("tag")
    )
    joined = positional_zip_join(
        left, right, left_order=("k",), right_index_col="idx", num_range_partitions=8
    )
    rows = joined.collect()
    assert len(rows) == 1000
    assert all(r["k"] == r["idx"] for r in rows)

    # scale contract: the numeric-key path must not funnel the left side
    # through a single-partition global sort
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    assert "SinglePartition" not in buf.getvalue()


def test_semi_join(spark):
    facts = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    members = spark.createDataFrame([(2, "x"), (2, "y"), (3, "z")], "m long, other string")
    got = {r["k"] for r in semi_join_members(facts, members, "k", "m").collect()}
    assert got == {2, 3}


def _psm_protein(spark):
    rows = [
        # protein P1: exclusive peptide AAA (distinguishable)
        ("u1", "AAA", "AAA/2", 2, 500.0, False, 0.001, ["m1"], "P1"),
        ("u2", "AAA", "AAA/2", 2, 500.0, False, 0.002, ["m2"], "P1"),   # same peptide, worse q
        ("u3", "BBB", "BBB/2", 2, 600.0, False, 0.003, [], "P1"),
        # P2/P3 share peptide CCC only (indistinguishable)
        ("u4", "CCC", "CCC/3", 3, 700.0, False, 0.004, [], "P2"),
        ("u4", "CCC", "CCC/3", 3, 700.0, False, 0.004, [], "P3"),
        # decoy-only protein P4
        ("u5", "DDD", "DDD/2", 2, 800.0, True, 0.05, [], "P4"),
    ]
    return spark.createDataFrame(
        rows,
        "usi string, peptideSequence string, peptidoform string, precursorCharge int, "
        "precursorMz double, isDecoy boolean, qvalue double, modificationNames array<string>, "
        "proteinAccession string",
    )


def test_protein_rollup(spark):
    rolled = {r["proteinAccession"]: r for r in protein_rollup(_psm_protein(spark)).collect()}
    p1 = rolled["P1"]
    assert p1["numberPSMs"] == 2          # u1/u2 dedup by peptideSequence → AAA + BBB
    assert p1["numberPeptides"] == 2
    assert p1["bestSearchEngineScoreValue"] == 0.001
    assert p1["isDecoy"] is False
    # r10 parity fix: mod names accumulate over ALL member PSMs (the
    # reference's proteinPTMs.addAll runs per PSM before any dedup), so
    # u2's m2 — a non-representative PSM of the same sequence — counts
    assert p1["modificationsNames"] == ["m1", "m2"]
    assert [x["usi"] for x in p1["psmAccessions"]] == ["u1", "u3"]
    assert rolled["P4"]["isDecoy"] is True


def test_protein_rollup_decoy_over_all_members(spark):
    """r10 parity fix: the decoy flag is the reference's anyMatch over
    ALL member PSMs — a decoy PSM shadowed by a better target PSM of the
    SAME sequence still marks the protein."""
    rows = [
        ("u1", "AAA", "AAA/2", 2, 500.0, False, 0.001, ["m1"], "P1"),
        ("u2", "AAA", "AAA/2", 2, 500.0, True, 0.002, [], "P1"),  # shadowed decoy
    ]
    df = spark.createDataFrame(
        rows,
        "usi string, peptideSequence string, peptidoform string, precursorCharge int, "
        "precursorMz double, isDecoy boolean, qvalue double, modificationNames array<string>, "
        "proteinAccession string",
    )
    p1 = protein_rollup(df).collect()[0]
    assert p1["isDecoy"] is True       # anyMatch over all, not the kept row
    assert p1["numberPSMs"] == 1       # representatives still dedupe
    assert [x["usi"] for x in p1["psmAccessions"]] == ["u1"]


def test_distinguishable_categories(spark):
    got = {
        r["proteinAccession"]: r["inferenceCategory"]
        for r in distinguishable_categories(_psm_protein(spark)).collect()
    }
    assert got == {
        "P1": "distinguishable",
        "P2": "indistinguishable",
        "P3": "indistinguishable",
        "P4": "distinguishable",
    }


def test_explode_protein_accessions(spark):
    df = spark.createDataFrame(
        [("u1", ["P1", "P2"]), ("u2", ["P1"])], "usi string, proteinAccessions array<string>"
    )
    got = explode_protein_accessions(df).groupBy("proteinAccession").count().collect()
    assert {(r["proteinAccession"], r["count"]) for r in got} == {("P1", 2), ("P2", 1)}


# ---------------------------------------------------------------------------
# As-of join (north-star custom operator; pandas merge_asof is the oracle)
# ---------------------------------------------------------------------------

def _asof_case(seed, n_left=120, n_right=80, n_keys=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    left = [
        (int(rng.integers(0, 10_000)), f"g{int(rng.integers(0, n_keys))}", i)
        for i in range(n_left)
    ]
    right = [
        (int(rng.integers(0, 10_000)), f"g{int(rng.integers(0, n_keys))}", float(i) * 1.5)
        for i in range(n_right)
    ]
    return left, right


def _asof_expected(left, right, by, tolerance, direction):
    import pandas as pd

    lp = pd.DataFrame(left, columns=["ts", "g", "lid"]).sort_values("ts", kind="mergesort")
    rp = pd.DataFrame(right, columns=["ts", "g", "rv"]).sort_values("ts", kind="mergesort")
    out = pd.merge_asof(
        lp, rp, on="ts", by=("g" if by else None),
        tolerance=tolerance, direction=direction, suffixes=("", "_right"),
    )
    cols = ["ts", "g", "lid", "rv"] + (["g_right"] if not by else [])
    rows = set()
    for t in out[cols].itertuples(index=False):
        d = t._asdict()
        rows.add((d["ts"], d["g"], d["lid"],
                  None if pd.isna(d["rv"]) else d["rv"]))
    return rows


def _asof_actual(spark, left, right, by, tolerance, direction):
    from pride_spark.operators.joins import asof_join

    ldf = spark.createDataFrame(left, "ts long, g string, lid long")
    rdf = spark.createDataFrame(right, "ts long, g string, rv double")
    if not by:
        rdf = rdf.withColumnRenamed("g", "g_right_src").drop("g_right_src")
    # rv is monotone in input order, so it doubles as the pandas
    # input-position tie-breaker for duplicate right keys
    out = asof_join(
        ldf, rdf, "ts", by=(["g"] if by else None),
        tolerance=tolerance, direction=direction, right_order_col="rv",
    )
    return {
        (r["ts"], r["g"], r["lid"], r["rv"]) for r in out.collect()
    }


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("by", [True, False])
def test_asof_join_matches_pandas(spark, direction, by):
    for seed in (7, 41):
        left, right = _asof_case(seed)
        if not by:
            right = [(ts, g, rv) for ts, g, rv in right]
        exp = _asof_expected(left, right, by, None, direction)
        act = _asof_actual(spark, left, right, by, None, direction)
        assert act == exp, f"dir={direction} by={by} seed={seed}"


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_tolerance_matches_pandas(spark, direction):
    left, right = _asof_case(11)
    exp = _asof_expected(left, right, True, 500, direction)
    act = _asof_actual(spark, left, right, True, 500, direction)
    assert act == exp


def test_asof_join_equal_ts_inclusive_and_matched_key(spark):
    from pride_spark.operators.joins import asof_join

    ldf = spark.createDataFrame([(10, 1), (5, 2)], "ts long, lid long")
    rdf = spark.createDataFrame([(10, 1.0), (4, 2.0)], "ts long, rv double")
    rows = {r["lid"]: r for r in asof_join(ldf, rdf, "ts").collect()}
    assert rows[1]["rv"] == 1.0 and rows[1]["__asof_ts"] == 10  # inclusive
    assert rows[2]["rv"] == 2.0 and rows[2]["__asof_ts"] == 4
