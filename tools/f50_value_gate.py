"""Collect-free value gate for factor-50+ scales.

The sf1 gate hashes by collecting the full Spark result into pandas —
at factor 50 the wide-output queries (q33's MGF records, q39's
regrouped PTM rows) exceed ``spark.driver.maxResultSize`` (>1 GiB of
strings), so full-result hashing stops being a harness option long
before the ENGINE has any problem.  This gate keeps value-level
equality without collecting anything: each engine reduces its own
result to ``(row_count, SUM(int(md5(row)[:15], 16)))`` — an
order-independent commutative fingerprint — and only the two scalars
cross the driver.

Portability: every gated query emits ONLY string columns (asserted), so
the row line (columns sorted by name, joined with US, NULL → NUL) and
its md5 are byte-identical across Spark and DuckDB; the 60-bit hash
prefix summed into a 128-bit accumulator (decimal(38,0) / HUGEINT)
cannot overflow below ~10^19 rows.  Float columns are NOT portable
as strings (formatting differs across engines) — the strict default
refuses them.

``--float-mode round9`` (r11, for the FDR queries q03/q45) widens the
gate to double columns via ``CAST(ROUND(col * 1e9) AS BIGINT)`` applied
IDENTICALLY in both engines.  Why this is portable: the sf0.01 oracle
gate compares these queries' doubles EXACTLY (no rounding in
check_oracle._norm), so Spark and DuckDB provably hold bit-identical
IEEE values; ``col * 1e9`` is one IEEE multiplication of identical
inputs (identical result), and both engines' ROUND is half-away-from-
zero (Spark HALF_UP == away-from-zero on ties; DuckDB likewise), so
identical doubles round identically.  Resolution 1e-9 at a magnitude
bound of ~9e9 (BIGINT) — fine for FDR/q-value ratios in [0, ~1e7].

``--float-mode bits`` (r12, verdict task #8) is the EXACT form: every
double column maps to its raw IEEE-754 bit pattern as a BIGINT
(``Double.doubleToRawLongBits`` semantics) via an Arrow-vectorized
numpy ``view(int64)`` registered as a UDF in BOTH engines — zero
rounding, so a single-ulp divergence anywhere in 34M rows fails the
gate.  NaNs are canonicalized to one quiet-NaN pattern (doubleToLongBits
convention) and -0.0 is kept distinct from 0.0.  This retires round9's
"sub-nano systematic divergence could hide" caveat for any query it
gates.

Usage:
    python tools/f50_value_gate.py --sf-dir /tmp/sf5 \
        [--queries q33_mgf_record,q39_mod_regroup] [--out FILE] \
        [--float-mode refuse|round9|bits]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

US, NUL = "\x1f", "\x02"  # NUL is not representable in a DuckDB varchar literal

#: Double.doubleToLongBits' canonical quiet-NaN pattern — both engines'
#: bit UDFs collapse every NaN payload to this, so a NaN compares equal
#: to a NaN regardless of which operation produced it.
_CANON_NAN_BITS = 0x7FF8000000000000


def _bits_numpy(values):
    """float64 array → IEEE-754 bit patterns as int64 (NaN canonicalized,
    -0.0 kept distinct from 0.0) — the shared kernel of both engines'
    ``--float-mode bits`` UDFs."""
    import numpy as np

    arr = np.ascontiguousarray(values, dtype=np.float64)
    bits = arr.view(np.int64).copy()
    bits[np.isnan(arr)] = _CANON_NAN_BITS
    return bits


def _spark_double_bits_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def dbits(s):
        # self-contained (no module globals): executors unpickle this
        # closure without importing the tools module, which is not on
        # the worker path when another tool imports f50_value_gate
        import numpy as np
        import pandas as pd

        mask = s.isna()  # SQL NULL must stay NULL, not become NaN bits
        arr = np.ascontiguousarray(s.fillna(0.0).to_numpy(), dtype=np.float64)
        bits = arr.view(np.int64).copy()
        bits[np.isnan(arr)] = 0x7FF8000000000000
        # nullable-Int64 FIRST, then pd.NA: assigning None into a plain
        # int64 Series upcasts it to float64, silently rounding every
        # bit pattern above 2^53 in any batch that contains a NULL —
        # which is exactly the false-FAIL a bit-exact gate must not
        # manufacture (r12 review, reproduced on pandas 2.2)
        out = pd.Series(bits, index=s.index).astype("Int64")
        out[mask] = pd.NA
        return out

    # real class objects, not strings: the module's `from __future__
    # import annotations` would stringify inline hints and pandas is
    # only imported locally, so Spark's hint resolution cannot see it
    dbits.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(dbits, "bigint")


def _register_duckdb_bits(con) -> None:
    """Register ``dbits(DOUBLE) -> BIGINT`` in DuckDB with the SAME numpy
    kernel (Arrow-vectorized; DuckDB passes NULLs through by default for
    scalar Python UDFs)."""
    import duckdb.typing as T
    import pyarrow as pa

    def dbits(v):
        import numpy as np

        # arrow UDFs DO receive nulls; to_numpy would conflate them with
        # real NaN values, so carry the validity mask explicitly — SQL
        # NULL stays NULL (matching the Spark side), NaN gets the
        # canonical pattern
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        null_mask = np.asarray(v.is_null())
        arr = np.asarray(v.to_numpy(zero_copy_only=False), dtype=np.float64)
        bits = _bits_numpy(np.where(null_mask, 0.0, arr))
        return pa.array(bits, type=pa.int64(), mask=null_mask)

    try:
        con.create_function("dbits", dbits, [T.DOUBLE], T.BIGINT, type="arrow")
    except (duckdb.CatalogException, duckdb.NotImplementedException):
        pass  # already registered on this connection


def spark_fingerprint(df, *, canonicalize_complex: bool = False,
                      float_mode: str = "refuse"):
    """(row_count, SUM(int(md5(row)[:15], 16))) — order-independent.

    The strict default refuses non-string columns (cross-engine float
    formatting is not portable).  ``canonicalize_complex=True`` widens
    to arbitrary schemas by ``to_json``-ing arrays/structs and casting
    scalars to string — valid ONLY for Spark-vs-Spark comparison (e.g.
    tools/stress_occam.py's driver==distributed parity), never against
    DuckDB."""
    from pyspark.sql import functions as F

    if float_mode == "round9":
        dtypes = dict(df.dtypes)
        df = df.select(
            *[
                F.round(F.col(c) * 1e9).cast("bigint").alias(c)
                if dtypes[c] in ("double", "float")
                else F.col(c)
                for c in df.columns
            ]
        )
    elif float_mode == "bits":
        dtypes = dict(df.dtypes)
        dbl = [c for c in df.columns if dtypes[c] in ("double", "float")]
        if dbl:
            bits = _spark_double_bits_udf()

            def _b(c):
                # NaN is decided HERE, not in the pandas UDF: Arrow hands
                # the UDF SQL NULLs and NaNs as the same float64 NaN, so
                # the UDF alone cannot keep NULL -> NULL and NaN ->
                # canonical bits apart
                col = F.col(c).cast("double")
                return (
                    F.when(F.isnan(col), F.lit(_CANON_NAN_BITS))
                    .otherwise(bits(col))
                    .alias(c)
                )

            df = df.select(
                *[_b(c) if c in dbl else F.col(c) for c in df.columns]
            )
    # timestamps ride as epoch MICROSECONDS (exact; both engines store
    # micros) — their string renderings differ (zero-padding, 'T', tz
    # suffix) but unix_micros/epoch_us agree bit-for-bit under the UTC
    # session timezone the package pins (r13: the factor-10 distributed
    # gate needs the window queries q19/q36/q37/q52, all timestamped)
    dtypes = dict(df.dtypes)
    ts = [c for c, t in dtypes.items() if t.startswith("timestamp")]
    if ts:
        df = df.select(
            *[
                F.unix_micros(F.col(c).cast("timestamp")).alias(c)
                if c in ts
                else F.col(c)
                for c in df.columns
            ]
        )
    # ints, booleans and dates cast to identical strings in Spark and
    # DuckDB ("5", "true", "2020-01-02"); floats do NOT
    # (exponent/precision/zero-padding differ) and stay refused.
    portable = {"string", "int", "bigint", "smallint", "tinyint", "boolean", "date"}
    bad = [c for c, t in df.dtypes if t not in portable]
    if bad and not canonicalize_complex:
        raise ValueError(f"non-portable columns for this gate: {bad}")
    if not bad:
        df = df.select(*[F.col(c).cast("string").alias(c) for c in df.columns])
    if bad:
        dtypes = dict(df.dtypes)
        df = df.select(
            *[
                F.to_json(F.col(c)).alias(c)
                if dtypes[c].startswith(("array", "struct", "map"))
                else F.col(c).cast("string").alias(c)
                for c in df.columns
            ]
        )
    cols = sorted(df.columns)
    line = F.concat_ws(US, *[F.coalesce(F.col(c), F.lit(NUL)) for c in cols])
    row = df.select(
        F.conv(F.substring(F.md5(line), 1, 15), 16, 10)
        .cast("decimal(38,0)")
        .alias("h")
    )
    r = row.agg(F.count("*").alias("n"), F.sum("h").alias("s")).first()
    return int(r["n"]), int(r["s"])


def duckdb_fingerprint(con, oracle_sql: str, float_mode: str = "refuse"):
    desc = con.sql(f"DESCRIBE SELECT * FROM ({oracle_sql}) LIMIT 0").fetchall()
    cols = [d[0] for d in desc]
    # timestamps -> epoch micros, mirroring spark_fingerprint (exact)
    stamps = {d[0] for d in desc if d[1].upper().startswith("TIMESTAMP")}
    if stamps:
        proj = ", ".join(
            f"epoch_us({_q(c)}) AS {_q(c)}" if c in stamps else _q(c)
            for c in cols
        )
        oracle_sql = f"SELECT {proj} FROM ({oracle_sql})"
    if float_mode in ("round9", "bits"):
        floats = {d[0] for d in desc if d[1].upper() in ("DOUBLE", "FLOAT", "REAL")}
        if floats:
            if float_mode == "bits":
                _register_duckdb_bits(con)
                f_expr = "dbits(CAST({c} AS DOUBLE)) AS {c}"
            else:
                f_expr = "CAST(ROUND({c} * 1e9) AS BIGINT) AS {c}"
            proj = ", ".join(
                f_expr.format(c=_q(c)) if c in floats else _q(c) for c in cols
            )
            oracle_sql = f"SELECT {proj} FROM ({oracle_sql})"
    line = " || chr(31) || ".join(
        f"COALESCE(CAST({_q(c)} AS VARCHAR), chr(2))" for c in sorted(cols)
    )
    q = f"""
    SELECT COUNT(*) AS n,
           SUM(list_reduce(
             list_transform(range(15), i ->
               CAST(strpos('0123456789abcdef',
                    substring(md5({line}), CAST(i+1 AS INT), 1)) - 1 AS HUGEINT)),
             (acc, x) -> acc * 16 + x)) AS s
    FROM ({oracle_sql})
    """
    r = con.sql(q).fetchone()
    return int(r[0]), int(r[1])


def _q(c: str) -> str:
    return '"' + c.replace('"', '""') + '"'


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf5")
    ap.add_argument("--queries", default="q33_mgf_record,q39_mod_regroup")
    ap.add_argument("--out", default=None)
    ap.add_argument("--float-mode", default="refuse", choices=("refuse", "round9", "bits"))
    args = ap.parse_args()

    import __spark_entry__ as e
    from pride_spark.session import get_spark, release_cached_state

    spark = get_spark("f50-value-gate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        pattern = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pattern}'")

    qs, oracles = e.queries(), e.oracle_sql()
    out, fails = {"sf_dir": args.sf_dir, "queries": {}}, 0
    for name in args.queries.split(","):
        name = name.strip()
        t0 = time.time()
        try:
            n_s, h_s = spark_fingerprint(
                qs[name](spark, args.sf_dir), float_mode=args.float_mode
            )
            t_spark = time.time() - t0
            t0 = time.time()
            n_d, h_d = duckdb_fingerprint(con, oracles[name], args.float_mode)
            t_duck = time.time() - t0
            ok = n_s == n_d and h_s == h_d
            out["queries"][name] = {
                "rows_spark": n_s,
                "rows_duckdb": n_d,
                "hash_equal": ok,
                "sec_spark": round(t_spark, 2),
                "sec_duckdb": round(t_duck, 2),
                "status": "PASS" if ok else "FAIL",
            }
        except Exception as exc:
            out["queries"][name] = {"status": "ERROR", "err": repr(exc)[:200]}
            ok = False
        fails += 0 if ok else 1
        print(f"  {name:28s} {out['queries'][name]['status']}", file=sys.stderr)
        release_cached_state(spark)
    out["n_pass"] = len(out["queries"]) - fails
    out["n_fail"] = fails
    payload = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(payload)
    print(payload)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
