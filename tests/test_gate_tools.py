"""Cross-engine fingerprint kernels of the scale gates (tools/
f50_value_gate.py, reused by tools/sf1_gate.py --hash distributed).

These folds ARE the correctness evidence at factors 10-50, so their own
failure modes get pinned here — in particular the r12 review's
confirmed bug: assigning None into an int64 pandas Series upcasts it to
float64 and silently rounds every IEEE bit pattern above 2^53, making
the "bit-exact" gate manufacture false FAILs on any Arrow batch that
contains a SQL NULL.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "f50_value_gate.py",
)


@pytest.fixture(scope="module")
def fvg():
    spec = importlib.util.spec_from_file_location("fvg_under_test", _TOOL)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bits_fingerprint_survives_null_in_batch(spark, fvg):
    """r12 review (reproduced): a NULL sharing an Arrow batch with a
    double whose bit pattern exceeds 2^53 corrupted the Spark-side bits
    (int64 -> float64 upcast on None assignment) while DuckDB stayed
    exact — a false FAIL_HASH from the gate itself.  Both engines must
    produce the identical (count, sum) fold, and the fold must equal a
    hand-computed md5 ground truth."""
    import hashlib

    df = spark.createDataFrame(
        [("a", 0.0123456), ("b", None)], "k string, x double"
    ).coalesce(1)  # ONE batch: the null must share it with the value
    s = fvg.spark_fingerprint(df, float_mode="bits")

    con = duckdb.connect()
    d = fvg.duckdb_fingerprint(
        con,
        "SELECT k, CAST(x AS DOUBLE) AS x "
        "FROM (VALUES ('a',0.0123456),('b',NULL)) t(k,x)",
        "bits",
    )
    assert s == d

    want = sum(
        int(hashlib.md5(line.encode()).hexdigest()[:15], 16)
        for line in ["a\x1f4578270375644690585", "b\x1f\x02"]
    )
    assert s == (2, want)  # 4578270375644690585 = exact bits of 0.0123456


def test_bits_fingerprint_nan_and_signed_zero(spark, fvg):
    """NaN canonicalizes to ONE pattern in both engines; -0.0 stays
    bit-distinct from 0.0; SQL NULL stays NULL (not NaN bits)."""
    df = spark.createDataFrame(
        [("a", float("nan")), ("b", -0.0), ("c", 0.0), ("d", None)],
        "k string, x double",
    ).coalesce(1)
    s = fvg.spark_fingerprint(df, float_mode="bits")
    con = duckdb.connect()
    d = fvg.duckdb_fingerprint(
        con,
        "SELECT k, CAST(x AS DOUBLE) AS x FROM (VALUES "
        "('a', CAST('nan' AS DOUBLE)), ('b', CAST('-0.0' AS DOUBLE)), "
        "('c', 0.0), ('d', NULL)) t(k,x)",
        "bits",
    )
    assert s == d and s[0] == 4


def test_fingerprint_timestamps_fold_as_epoch_micros(spark, fvg):
    """r13 (verdict task: factor-10 gate in distributed mode): the
    window queries carry TIMESTAMP columns, whose string renderings
    differ across engines — the fold encodes them as epoch MICROS
    (exact, both engines store micros) under the UTC session timezone.
    NULL timestamps must stay NULL (not epoch 0)."""
    df = spark.createDataFrame(
        [("a", "2024-05-10 06:30:00.123456"), ("b", None)],
        "k string, t string",
    ).selectExpr("k", "cast(t as timestamp) as t")
    s = fvg.spark_fingerprint(df, float_mode="bits")

    con = duckdb.connect()
    d = fvg.duckdb_fingerprint(
        con,
        "SELECT 'a' AS k, TIMESTAMP '2024-05-10 06:30:00.123456' AS t "
        "UNION ALL SELECT 'b', NULL",
        "bits",
    )
    assert s == d and s[0] == 2

    # sub-second precision must survive: micros differ -> folds differ
    d2 = fvg.duckdb_fingerprint(
        con,
        "SELECT 'a' AS k, TIMESTAMP '2024-05-10 06:30:00.123457' AS t "
        "UNION ALL SELECT 'b', NULL",
        "bits",
    )
    assert s != d2
