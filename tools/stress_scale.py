"""Scale-stress harness: synthesize an ~sf1 dataset from sf0.1 and run
the heavy registry queries against it.

VERDICT r01 item 10 ("run end-to-end at sf1 to catch memory/partition
issues the sf0.1 bench hides").  The driver ships no sf1 parquet, so we
manufacture one: each fact table is unioned ``--factor`` times with its
primary key offset per copy (dimension tables are copied once).  The
data distribution per copy is identical to sf0.1, which is exactly what
we want — the stress is cardinality, not new value domains.

Duplicated *text/embedding* payloads are a feature here: the dedup and
LSH queries see a corpus where every document has ``factor`` exact
copies, which pressure-tests the bucket caps and the exact-dedup
shuffle far harder than organic data would.

Usage:
    python tools/stress_scale.py [--factor 10] [--out /tmp/sf1]
        [--queries q03_fdr_qvalue,q47_connected_components,...]
        [--skip-build]

Prints one JSON line per query (name, seconds, rows) and a total.
Intentionally not part of the oracle gate: no DuckDB comparison at this
scale, correctness is sf0.01's job.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

# key column to offset per copy; None => dimension, copy once
KEYED = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "customer": None,
    "supplier": None,
    "part": None,
    "nation": None,
    "region": None,
}

# The queries worth stressing: every one VERDICT called expensive or
# scale-relevant, plus the shuffle-heavy rollups.
DEFAULT_QUERIES = [
    "q03_fdr_qvalue",
    "q05_big_join_agg",
    "q13_dedup_exact",
    "q23_minhash_signature",
    "q24_lsh_near_dup",
    "q26_positional_join",
    "q28_protein_rollup",
    "q31_occams_razor",
    "q33_mgf_record",
    "q35_simhash",
    "q39_mod_regroup",
    "q43_ivf_ann",
    "q45_combined_fdr",
    "q47_connected_components",
    "q48_spectral_cluster",
]


def build(spark, out: str, factor: int, tables: list[str] | None = None) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    for table, key in KEYED.items():
        if tables and table not in tables:
            continue
        src = f"{SRC}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        if os.path.exists(dst):
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.exists(dst):
                os.remove(dst)
        df = spark.read.parquet(src)
        if key is None or factor == 1:
            scaled = df
        else:
            stride = df.agg(F.max(key)).first()[0] + 1
            copies = [
                df.withColumn(key, F.col(key) + F.lit(int(k * stride)))
                for k in range(factor)
            ]
            scaled = copies[0]
            for c in copies[1:]:
                scaled = scaled.unionByName(c)
        # one parquet dir per table, same layout the registry's _t expects
        scaled.write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"built {table}: {n} rows", file=sys.stderr)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument(
        "--runs", type=int, default=1,
        help="timed runs per query (best+median reported; a run count >1 "
        "adds one untimed discard run first, like bench.py) — the "
        "isolated clean re-measure mode for gate rows whose interleaved "
        "timing needs attribution",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list: build only these tables (adversarial runs that "
        "touch documents/embeddings need not materialize lineitem x64)",
    )
    ap.add_argument(
        "--bucket-stats",
        action="store_true",
        help="also run dedup.lsh_bucket_stats on the scaled documents and "
        "report the volume a max_bucket cap drops",
    )
    ap.add_argument(
        "--psm-sets",
        type=int,
        default=0,
        metavar="ENGINES",
        help="merged-analysis stress: synthesize ENGINES result-file copies "
        "of the scaled orders table as a canonical PSM frame and run "
        "group_psm_sets end-to-end — every set has exactly ENGINES members, "
        "the adversarial shape for the set-grouping exchange",
    )
    ap.add_argument(
        "--star-graph",
        type=int,
        default=0,
        metavar="N",
        help="adversarial CC stress: an N-leaf single-hub star (one "
        "component, max-degree N) through connected_components "
        "skew_safe='auto' — the shape where the window formulation is a "
        "single straggler task; auto must flip to groupBy-min",
    )
    args = ap.parse_args()

    from pride_spark.session import get_spark, release_cached_state
    from pride_spark import registry

    spark = get_spark(
        "stress-scale",
        # same session hygiene as bench.py: without a periodic driver GC
        # the ContextCleaner never reclaims finished queries' shuffle
        # state inside a short run, and tail queries degrade 30-70%
        extra_conf={"spark.cleaner.periodicGC.interval": "15s"},
    )
    if not args.skip_build:
        t0 = time.time()
        build(spark, args.out, args.factor,
              args.tables.split(",") if args.tables else None)
        print(f"build: {time.time() - t0:.1f}s", file=sys.stderr)

    qs = registry.queries()
    results, total = {}, 0.0
    for name in args.queries.split(","):
        name = name.strip()
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        t0 = time.time()
        try:
            if args.runs > 1:  # discard run: same rationale as bench.py
                qs[name](spark, args.out).write.format("noop").mode("overwrite").save()
                release_cached_state(spark)
            samples = []
            for _ in range(args.runs):
                t0 = time.time()
                df = qs[name](spark, args.out)
                # noop sink, not count(): count would let Spark prune every
                # unused column and skip the map-side work entirely
                df.write.format("noop").mode("overwrite").save()
                samples.append(time.time() - t0)
                if args.runs > 1:
                    release_cached_state(spark)
            s = sorted(samples)
            dt = s[0]
            results[name] = {"sec": round(s[0], 2)}
            if args.runs > 1:
                mid = len(s) // 2
                med = s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2
                results[name]["median_sec"] = round(med, 2)
                results[name]["runs"] = args.runs
        except Exception as exc:  # keep going; a stall/OOM is the finding
            dt = time.time() - t0
            results[name] = {"sec": round(dt, 2), "err": repr(exc)[:200]}
        total += dt
        print(json.dumps({name: results[name]}), file=sys.stderr)
        # measure each query against clean executor storage (see bench.py)
        release_cached_state(spark)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    out = {"factor": args.factor, "total_sec": round(total, 2), "queries": results}
    if args.star_graph:
        from pyspark.sql import functions as F

        from pride_spark.operators.graph import connected_components

        n = args.star_graph
        # hub 0 with n leaves, plus a chain welded on so the diameter>1
        edges = (
            spark.range(1, n + 1)
            .select(F.lit(0).alias("src"), F.col("id").alias("dst"))
            .union(
                spark.range(n + 1, n + 1001).select(
                    (F.col("id") - 1).alias("src"), F.col("id").alias("dst")
                )
            )
        )
        t0 = time.time()
        comp = connected_components(edges, skew_safe="auto")
        n_comp = comp.select("component").distinct().count()
        n_nodes = comp.count()
        out["star_graph"] = {
            "leaves": n,
            "nodes": int(n_nodes),
            "components": int(n_comp),
            "sec": round(time.time() - t0, 2),
        }
        print(json.dumps({"star_graph": out["star_graph"]}), file=sys.stderr)
    if args.psm_sets:
        from pyspark.sql import functions as F

        from pride_spark.operators.fdr import group_psm_sets

        o = spark.read.parquet(f"{args.out}/orders.parquet")
        # ENGINES identical result files over the scaled orders: every
        # (spectrum, sequence, charge) set has exactly ENGINES members
        frames = [
            o.select(
                F.lit(f"eng{e}.mzid").alias("fileName"),
                F.concat(F.lit(f"E{e}_"), F.col("o_orderkey")).alias("psmId"),
                F.col("o_orderkey").cast("string").alias("sourceId"),
                F.col("o_orderpriority").alias("peptideSequence"),
                F.array().cast(
                    "array<struct<position:int,accession:string,name:string>>"
                ).alias("modifications"),
                (F.col("o_orderkey") % 3 + 2).cast("int").alias("precursorCharge"),
                (F.col("o_totalprice") - e).alias("score"),
                (F.col("o_orderstatus") == "F").alias("isDecoy"),
                F.lit(f"MS:ENG{e}").alias("scoreAccession"),
            )
            for e in range(args.psm_sets)
        ]
        psms = frames[0]
        for fr in frames[1:]:
            psms = psms.unionByName(fr)
        # timed: ONE full materialization through the noop sink — a
        # count() would let Catalyst prune the provenance-collect windows
        # this mode exists to stress (see the timed-query loop above)
        t0 = time.time()
        sets = group_psm_sets(psms)
        sets.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 2)
        # stats pass runs UNTIMED (it re-executes the grouping)
        agg = sets.agg(
            F.count("*").alias("n"),
            F.min("setSize").alias("mn"),
            F.max("setSize").alias("mx"),
        ).collect()[0]
        out["psm_sets"] = {
            "engines": args.psm_sets,
            "input_rows": int(agg["n"]) * args.psm_sets,
            "sets": int(agg["n"]),
            "set_size_min": int(agg["mn"]),
            "set_size_max": int(agg["mx"]),
            "sec": dt,
        }
        print(json.dumps({"psm_sets": out["psm_sets"]}), file=sys.stderr)
    if args.bucket_stats:
        from pride_spark.operators import dedup

        docs = spark.read.parquet(f"{args.out}/documents.parquet")
        t0 = time.time()
        # cap matches q24's production setting (registry.py max_bucket=500)
        stats = dedup.lsh_bucket_stats(docs, "text", "doc_id", max_bucket=500)
        stats["sec"] = round(time.time() - t0, 2)
        out["bucket_stats"] = {k: int(v) if k != "sec" else v for k, v in stats.items()}
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
