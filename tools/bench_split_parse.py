"""Whole-file vs byte-range-split mzIdentML parse wall clock.

The split reader's claim (ARCHITECTURE.md §12) is that a single giant
result file is no longer a parallelism ceiling: whole-file mode DOM-parses
it in ONE task, split mode fans the same bytes across every core.  This
harness builds an n-PSM single-file fixture (tools/bench_pipeline.py's
generator) and times both strategies end-to-end (parse → count).

Usage: python tools/bench_split_parse.py [--n 1000000] [--out /tmp/split_bench]

Prints one JSON line with fixture size and per-mode seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/split_bench")
    ap.add_argument("--skip-whole", action="store_true",
                    help="only time split mode (whole mode is minutes at 1M+)")
    args = ap.parse_args()

    from bench_pipeline import build_fixture

    mzid = os.path.join(args.out, "big.mzid")
    if not os.path.exists(mzid):
        t0 = time.time()
        mzid, _ = build_fixture(args.n, args.out)
        print(f"fixture built in {time.time()-t0:.1f}s", file=sys.stderr)

    from pride_spark.session import get_spark
    from pride_spark.sources.mzid import read_mzid_psms_split, read_mzid_psms_whole

    spark = get_spark("bench-split-parse")
    out = {
        "n_psms": args.n,
        "mzid_mb": os.path.getsize(mzid) >> 20,
        "cores": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    t0 = time.time()
    out["rows_split"] = read_mzid_psms_split(spark, [mzid]).count()
    out["sec_split"] = round(time.time() - t0, 1)
    if not args.skip_whole:
        t0 = time.time()
        out["rows_whole"] = read_mzid_psms_whole(spark, [mzid]).count()
        out["sec_whole"] = round(time.time() - t0, 1)
        out["speedup"] = round(out["sec_whole"] / out["sec_split"], 1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
