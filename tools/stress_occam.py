"""Distributed Occam's-razor at genuine scale (round-9 verdict task 5).

The driver==distributed parity tests force the switch with tiny
``max_groups``; this harness runs the distributed absorption joins on a
corpus that NEEDS them: >2M distinct peptide sets (past the default
``max_groups=2_000_000`` driver ceiling), generated DISTRIBUTIVELY as
subset chains — the same corpus family tools/occam_crossover.py
measures, at 40× its largest point.

Corpus shape (``--chains`` chains, depth 4): protein C{c}_D{d} carries
peptides c_pep0..c_pepd, so every chain contributes 4 distinct peptide
sets of which 3 are strict subsets of the deepest — the absorption
joins erase 75% of the group table before the cover collect, which is
exactly the regime the distributed formulation exists for.

Two measurements:

1. ``big``: chains*4 > 2M groups end-to-end through the PUBLIC
   ``occams_razor`` entry point with DEFAULT ceilings — proving the
   auto-switch fires and the join-based absorption + bounded cover
   finish at a scale where collecting the group table would hold
   ~2.2M × (members + peptides) Python objects on the driver.
2. ``boundary parity``: a corpus of exactly ``max_groups + 1`` groups
   (one past the ceiling) hashed against the same corpus run with an
   uncapped driver loop — value-level equality at the forced switch
   point, not just at toy sizes.

Usage: python tools/stress_occam.py [--chains 550000]
                                    [--boundary-groups 40000]
Prints one JSON object.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # f50_value_gate


def chain_corpus(spark, chains: int):
    """PSM frame of `chains` subset chains, built distributively
    (no driver-side row list): chains*4 distinct peptide sets."""
    from pyspark.sql import functions as F

    return (
        spark.range(chains * 4)
        .select(
            (F.col("id") / 4).cast("long").alias("c"),
            (F.col("id") % 4).cast("int").alias("d"),
        )
        .select(
            "c",
            "d",
            F.explode(F.sequence(F.lit(0), F.col("d"))).alias("i"),
        )
        .select(
            F.concat(F.lit("c"), F.col("c"), F.lit("_pep"), F.col("i")).alias(
                "peptideSequence"
            ),
            F.array(
                F.concat(F.lit("C"), F.col("c"), F.lit("_D"), F.col("d"))
            ).alias("proteinAccessions"),
        )
        .repartition(32)
    )


def _result_hash(df) -> tuple[int, int]:
    """(rows, commutative md5-prefix sum) — the SHARED fingerprint from
    tools/f50_value_gate.py, widened to complex columns (Spark-vs-Spark
    comparison only, so json-canonicalized arrays are fine)."""
    from f50_value_gate import spark_fingerprint

    return spark_fingerprint(df, canonicalize_complex=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=550_000)
    ap.add_argument("--boundary-groups", type=int, default=40_000)
    args = ap.parse_args()

    from pride_spark.operators.inference import occams_razor
    from pride_spark.session import get_spark

    spark = get_spark(
        "stress-occam", extra_conf={"spark.cleaner.periodicGC.interval": "15s"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}

    # 1. big: chains*4 groups (> 2M default ceiling) through the public
    # entry point — the auto-switch fires inside occams_razor
    psms = chain_corpus(spark, args.chains).persist()
    n_rows = psms.count()  # materialize outside the timer
    t0 = time.time()
    res = occams_razor(psms)  # DEFAULT max_groups=2M: 2.2M groups switch
    res.write.format("noop").mode("overwrite").save()
    big_sec = time.time() - t0
    from pyspark.sql import functions as F

    t0 = time.time()
    cats = {
        r["category"]: r["n"]
        for r in res.groupBy("category").agg(F.count("*").alias("n")).collect()
    }
    out["big"] = {
        "chains": args.chains,
        "distinct_groups": args.chains * 4,
        "psm_rows": n_rows,
        "sec_noop": round(big_sec, 2),
        "sec_category_agg": round(time.time() - t0, 2),
        "categories": cats,
    }
    psms.unpersist()

    # 2. boundary parity: groups = max_groups + 1 forces the switch with
    # the PUBLIC knob; the driver run lifts the ceiling on the same corpus.
    # chain_corpus builds chains*4 groups, so round UP and derive the
    # ceiling from the ACTUAL group count — deriving it from the raw
    # argument under-counted when --boundary-groups wasn't a multiple of
    # 4, and the "distributed" run silently stayed on the driver loop
    # (r10 review).
    chains_b = (args.boundary_groups + 3) // 4
    g = chains_b * 4
    psms_b = chain_corpus(spark, chains_b).persist()
    psms_b.count()
    dist = occams_razor(psms_b, max_groups=g - 1)  # g groups > g-1: switch
    drv = occams_razor(psms_b, max_groups=10 * g)  # driver loop
    n_d, h_d = _result_hash(dist)
    n_v, h_v = _result_hash(drv)
    out["boundary_parity"] = {
        "groups": g,
        "rows_distributed": n_d,
        "rows_driver": n_v,
        "hash_equal": bool(n_d == n_v and h_d == h_v),
    }
    psms_b.unpersist()
    print(json.dumps(out))
    spark.stop()
    return 0 if out["boundary_parity"]["hash_equal"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
