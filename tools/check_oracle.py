"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
against the same parquet tables, then compares row count, column-name set,
and the order-insensitive multiset of values (columns sorted by name).

Usage:  python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import sys
import time
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    """Canonicalize a value for cross-engine comparison."""
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _key(row):
    return repr(row)


def _canon_pd(pdf):
    """Mimic the driver's pandas canonicalization: columns sorted by name,
    rows sorted by all columns.  Raises (like the driver) on unhashable
    cells, e.g. ndarray-valued array columns."""
    pdf = pdf.copy()
    for c in pdf.columns:
        # normalize datetime unit (Spark=ns, DuckDB=us; driver treats the
        # same instant as equal)
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[ns]")
    cols = sorted(pdf.columns)
    out = pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return out


def strict_compare(spark_df, con, sql):
    """Driver-fidelity check: pandas canon on both sides, then dtype +
    value equality.  Catches what the lax tuple compare misses (DuckDB
    HUGEINT -> float64, int vs float cells, ndarray cells)."""
    import pandas as pd

    s_pd = _canon_pd(spark_df.toPandas())
    d_pd = _canon_pd(con.execute(sql).df())
    try:
        h_s = pd.util.hash_pandas_object(s_pd, index=False).sum()
        h_d = pd.util.hash_pandas_object(d_pd, index=False).sum()
    except TypeError as ex:
        return False, f"unhashable cells (driver would crash): {ex}"
    if h_s != h_d:
        neq = [c for c in s_pd.columns if not s_pd[c].equals(d_pd[c])]
        return False, f"strict hash mismatch; unequal cols={neq}"
    return True, "strict-ok"


def compare(name, spark_df, con, sql):
    cols = sorted(spark_df.columns)
    t0 = time.time()
    s_rows = [tuple(_norm(r[c]) for c in cols) for r in spark_df.collect()]
    t_spark = time.time() - t0
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_idx = {c: i for i, c in enumerate(d_cols)}
    if sorted(d_cols) != cols:
        return False, f"schema mismatch: spark={cols} duckdb={sorted(d_cols)}", t_spark
    d_rows = [tuple(_norm(r[d_idx[c]]) for c in cols) for r in res.fetchall()]
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duckdb={len(d_rows)}", t_spark
    s_sorted, d_sorted = sorted(s_rows, key=_key), sorted(d_rows, key=_key)
    bad = [(a, b) for a, b in zip(s_sorted, d_sorted) if a != b]
    if bad:
        return False, f"{len(bad)}/{len(s_rows)} value mismatches; first: spark={bad[0][0]!r} duckdb={bad[0][1]!r} cols={cols}", t_spark
    ok, msg = strict_compare(spark_df, con, sql)
    if not ok:
        return False, f"values equal but STRICT fail: {msg}", t_spark
    return True, f"{len(s_rows)} rows", t_spark


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from pride_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            if name not in oracles:
                df = fn(spark, sf_dir)
                n = df.count()
                print(f"  {name:28s} ROWS-ONLY  {n} rows")
                continue
            ok, msg, t_spark = compare(name, fn(spark, sf_dir), con, oracles[name])
            status = "PASS" if ok else "FAIL"
            n_pass += ok
            n_fail += not ok
            print(f"  {name:28s} {status}  {msg}  [{t_spark:.1f}s]")
        except Exception as ex:
            n_fail += 1
            print(f"  {name:28s} ERROR  {type(ex).__name__}: {str(ex)[:300]}")
    print(f"== {n_pass} pass / {n_fail} fail @ {sf_dir}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
