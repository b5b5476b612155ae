"""sf1 correctness gate — hash-equality for EVERY oracled query at 10×
the bench scale (round 5 widened the default from the 20 heaviest to
all 50; ``--queries heavy`` keeps the legacy subset).

The sf0.01 oracle gate proves semantics; this gate catches
SCALE-DEPENDENT nondeterminism the small gate can't see: float summation
order across more partitions, round-trip drift, overflow, partition-count
sensitivity.  It reuses the driver-fidelity pandas canonicalization
(columns sorted by name, rows sorted by all columns, pandas object hash)
against DuckDB running the same oracle SQL over the same scaled parquet.

The scaled dataset comes from ``tools/stress_scale.py --factor 10`` (sf0.1
unioned 10× with offset keys) — build it first:

    python tools/stress_scale.py --factor 10 --out /tmp/sf1 --queries ""
    python tools/sf1_gate.py [--sf-dir /tmp/sf1] [--out CORRECTNESS_sf1_r04.json]
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

#: the 15 heaviest queries by bench wall time — the ones whose plans
#: touch the most data and therefore the most scale-dependent risk
HEAVY = [
    "q47_connected_components",
    "q33_mgf_record",
    "q39_mod_regroup",
    "q24_lsh_near_dup",
    "q48_spectral_cluster",
    "q28_protein_rollup",
    "q41_score_denoise",
    "q03_fdr_qvalue",
    "q35_simhash",
    "q43_ivf_ann",
    "q05_big_join_agg",
    "q26_positional_join",
    "q31_occams_razor",
    "q45_combined_fdr",
    "q23_minhash_signature",
    # round-4 fold rows — scale-sensitive by construction: q52's un-keyed
    # asof path derives its range buckets from approxQuantile (different
    # bucketing at 10×, same results required); q13's incremental banding
    # joins a 10×-skewed corpus side
    "q13_dedup_exact",
    "q52_stream_stream_join",
    "q20_quality_score",
    # round-4 session folds: q19 grew the hypertable cascade (scale risk:
    # decimal re-agg equality across more partitions), q46 grew the
    # binned range join (scale risk: bin replication correctness at 10x
    # interval volume)
    "q19_tumbling_window",
    "q46_rt_fallback",
]


def _canon(pdf):
    """Driver-fidelity canonicalization (see tools/check_oracle.py)."""
    pdf = pdf.copy()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[ns]")
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--out", default="CORRECTNESS_sf1_r05.json")
    ap.add_argument(
        "--queries",
        default="",
        help="comma list; empty = ALL registry queries (round 5 widened the "
        "gate from the HEAVY subset to every query). Pass 'heavy' for the "
        "legacy 20-query subset.",
    )
    ap.add_argument(
        "--hash",
        default="collect",
        choices=("collect", "distributed"),
        help="collect = pandas hash of the full result on the driver (the "
        "r4 default; exceeds driver.maxResultSize on wide outputs past "
        "factor ~20).  distributed = each engine folds every column of "
        "every row into (count, SUM(md5-prefix)) inside itself and only "
        "two scalars cross the driver (r12, verdict task #6) — the same "
        "full-row equality strength at ANY scale.  Doubles ride through "
        "bit-exact IEEE-bits UDFs (f50_value_gate --float-mode bits), so "
        "nothing is rounded.",
    )
    args = ap.parse_args()

    import pandas as pd

    import __spark_entry__ as e
    from pride_spark.session import get_spark, release_cached_state

    spark = get_spark("sf1-gate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        # stress_scale writes parquet DIRECTORIES; driver testdata is flat files
        pattern = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pattern}'")

    qs, oracles = e.queries(), e.oracle_sql()
    # Extra gate-only row (not a registry entry — the driver gate is
    # capped at 50): q48's PRODUCTION lsh path in isolation, so the
    # factor-10 timing isn't dominated by the O(bucket²) exact block
    # baseline that exists only as oracle-grade gate scope.
    from pride_spark import registry as _reg

    qs["q48_spectral_cluster_lsh"] = _reg.q48_production_lsh
    oracles["q48_spectral_cluster_lsh"] = _reg.q48_production_lsh_oracle_sql()
    if args.queries.strip() == "heavy":
        names = HEAVY + ["q48_spectral_cluster_lsh"]
    elif args.queries.strip():
        names = [n.strip() for n in args.queries.split(",")]
    else:
        names = [n for n in qs if n in oracles]
    if args.hash == "distributed":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import f50_value_gate as fvg

    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            if args.hash == "distributed":
                # only the FINGERPRINTING differs between modes — the
                # loop tail (fail count, print, session hygiene) is
                # shared below (r12 review: a copy-pasted tail drifts)
                sdf = qs[name](spark, args.sf_dir)
                # the folds hash VALUES only (column names never enter the
                # line), so schema equality is checked explicitly here
                d_cols = [
                    d[0]
                    for d in con.sql(
                        f"DESCRIBE SELECT * FROM ({oracles[name]}) LIMIT 0"
                    ).fetchall()
                ]
                schema_ok = sorted(sdf.columns) == sorted(d_cols)
                n_s, h_s = fvg.spark_fingerprint(sdf, float_mode="bits")
                t_spark = round(time.time() - t0, 2)
                t0 = time.time()
                n_d, h_d = fvg.duckdb_fingerprint(con, oracles[name], "bits")
                t_duck = round(time.time() - t0, 2)
                results[name] = {
                    "rows_spark": n_s,
                    "rows_duckdb": n_d,
                    "sec_spark": t_spark,
                    "sec_duckdb": t_duck,
                    "hash_mode": "distributed-bits",
                    "status": (
                        "FAIL_SCHEMA" if not schema_ok
                        else "FAIL_ROWS" if n_s != n_d
                        else "PASS" if h_s == h_d
                        else "FAIL_HASH"
                    ),
                }
            else:
                s_pd = _canon(qs[name](spark, args.sf_dir).toPandas())
                t_spark = round(time.time() - t0, 2)
                t0 = time.time()
                d_pd = _canon(con.execute(oracles[name]).df())
                t_duck = round(time.time() - t0, 2)
                entry: dict = {
                    "rows_spark": int(len(s_pd)),
                    "rows_duckdb": int(len(d_pd)),
                    "sec_spark": t_spark,
                    "sec_duckdb": t_duck,
                }
                if len(s_pd) != len(d_pd):
                    entry["status"] = "FAIL_ROWS"
                elif sorted(s_pd.columns) != sorted(d_pd.columns):
                    entry["status"] = "FAIL_SCHEMA"
                else:
                    h_s = pd.util.hash_pandas_object(s_pd, index=False).sum()
                    h_d = pd.util.hash_pandas_object(d_pd, index=False).sum()
                    if h_s == h_d:
                        entry["status"] = "PASS"
                    else:
                        neq = [
                            c for c in s_pd.columns
                            if not s_pd[c].equals(d_pd[c])
                        ]
                        entry["status"] = "FAIL_HASH"
                        entry["unequal_cols"] = neq
                results[name] = entry
        except Exception as ex:
            results[name] = {
                "status": "ERROR",
                "err": f"{type(ex).__name__}: {str(ex)[:300]}",
            }
        n_fail += results[name]["status"] != "PASS"
        print(f"  {name:28s} {results[name]['status']}  "
              f"{results[name].get('rows_spark', '-')} rows", flush=True)
        # Same session hygiene as bench.py: a 50-query session otherwise
        # accumulates every query's deliberate pins (persisted frames, CC
        # round checkpoints, ANN index state) and tail queries degrade
        # under heap pressure — q33 measured 217s at position 33 of the
        # r5 full gate vs 88s in the r4 20-query gate, with its DuckDB
        # oracle moving only +28%.  Cleanup is OUTSIDE the timed window.
        release_cached_state(spark)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    out = {
        "sf_dir": args.sf_dir,
        "factor_note": "sf0.1 x10 via tools/stress_scale.py (offset keys)",
        "queries": results,
        "n_pass": len(results) - n_fail,
        "n_fail": n_fail,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"== {out['n_pass']} pass / {n_fail} fail -> {args.out}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
