"""Scale measurement for the corpus-curation pipeline
(plans/curate_corpus.py): a factored documents corpus — factor-N id-shifted
copies of the sf0.1 documents table, so content duplication is N× by
construction — through the full annotate → gate → exact-dedup → near-dup
→ split pipeline, with the drop-accounting report asserted to close.

This is the adversarial shape for a curation run: almost the entire
corpus is removable duplication, so the exact-dedup digest shuffle and
the LSH verify see their worst relative load.

Usage: python tools/stress_curate.py [--factor 100] [--runs 2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time

SRC = "/root/testdata/sf0.1/documents.parquet"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--scratch", default="/tmp/stress_curate")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from pride_spark.plans.curate_corpus import CurateConfig, curate_corpus
    from pride_spark.session import get_spark

    spark = get_spark("stress-curate")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(args.scratch, ignore_errors=True)
    docs_path = f"{args.scratch}/documents.parquet"
    base = spark.read.parquet(SRC)
    stride = base.agg(F.max("doc_id")).first()[0] + 1
    scaled = base
    for k in range(1, args.factor):
        scaled = scaled.unionByName(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(int(k * stride)))
        )
    scaled.repartition(32).write.mode("overwrite").parquet(docs_path)
    n_input = spark.read.parquet(docs_path).count()

    cfg = CurateConfig(min_quality=0.3, min_tokens=5, near_dup_threshold=0.8)
    samples, report = [], None
    for i in range(args.runs):
        out_dir = f"{args.scratch}/curated_{i}"
        docs = spark.read.parquet(docs_path)
        t0 = time.monotonic()
        _, report = curate_corpus(spark, docs, cfg, output_dir=out_dir)
        samples.append(round(time.monotonic() - t0, 2))

    kept = sum(report["splits"].values())
    dropped = (
        sum(report["gate_drops"].values())
        + report["exact_dup_drops"]
        + report["near_dup_drops"]
    )
    assert report["input_rows"] == n_input == kept + dropped, report
    samples.sort()
    mid = len(samples) // 2
    median = (
        samples[mid]
        if len(samples) % 2
        else round((samples[mid - 1] + samples[mid]) / 2, 2)
    )
    print(
        json.dumps(
            {
                "input_rows": n_input,
                "factor": args.factor,
                "sec_best": samples[0],
                "sec_median": median,
                "samples": samples,
                "runs": args.runs,
                "docs_per_sec_best": round(n_input / samples[0]),
                "report": report,
            }
        )
    )
    shutil.rmtree(args.scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
