"""Measure the driver-loop vs distributed Occam's-razor crossover.

VERDICT r5/r6 item: "document the crossover in ARCHITECTURE.md".  Both
formulations are result-identical (property + 64x adversarial tests);
this probe measures WALL TIME as the distinct-group count grows so the
`max_groups` default is a measured choice, not a guess.

Corpus shape per point: G groups = G/4 subset chains of depth 4 over a
shared peptide pool (absorption work scales with G), 8 PSM rows per
protein (the distributed prep has real fan-in to aggregate).

Usage: python tools/occam_crossover.py [--points 1000,5000,20000,50000]
Prints one JSON line per point; paste the summary into ARCHITECTURE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="1000,5000,20000,50000")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pride_spark.session import get_spark, release_cached_state

    spark = get_spark("occam-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    from pride_spark.operators.inference import occams_razor

    for g in [int(x) for x in args.points.split(",") if x.strip()]:
        chains = g // 4
        rows = []
        for c in range(chains):
            for depth in range(4):  # CHAIN_c_depth's set ⊃ all shallower
                for i in range(depth + 1):
                    rows.append((f"c{c}_pep{i}", [f"C{c}_D{depth}"]))
        psms = spark.createDataFrame(
            rows, "peptideSequence string, proteinAccessions array<string>"
        ).repartition(32)
        psms = psms.unionAll(psms)  # each row twice: collect_set dedup fan-in
        out = {}
        for label, ceiling in (("driver", 10_000_000), ("distributed", 0)):
            best = None
            for _ in range(args.runs):
                t0 = time.time()
                occams_razor(psms, max_groups=ceiling).write.format(
                    "noop"
                ).mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            out[label] = round(best, 2)
            release_cached_state(spark)
        print(json.dumps({"groups": g, **out}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
