"""Interleaved same-JVM A/B bench: attribute a timing delta to CODE, not
to the machine's mood.

Two code variants of the registry — the working tree (variant "work")
and a git revision (variant named by the rev) — run the SAME queries
ALTERNATING inside ONE SparkSession.  Session-to-session noise on this
container exceeds most real deltas (two identical-code sessions differed
5.57 s vs 7.23 s best; whole batteries have moved 2-3x between runs on
untouched code), so separate-session best-of-N cannot attribute a
regression; interleaving cancels the session-level component because
both variants sample the same JVM state, page cache, and interference
window.

Mechanics: the rev is exported with ``git archive`` to a temp dir; each
measurement swaps which package root ``pride_spark`` imports from by
purging ``sys.modules`` and re-importing (the SparkSession object is
py4j state independent of the package, so the JVM — codegen caches, JIT
profile, executor pools — persists across swaps).

Usage:
    python tools/ab_bench.py --ref HEAD~1 \
        --queries q28_protein_rollup,q29_mass_cleavage [--rounds 5]
Prints one JSON line: per-query per-variant {best, median, samples} and
the best-vs-best ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_registry(root: str):
    """(Re-)import pride_spark from ``root``, purging any prior variant.

    Both variants' modules are pure plan-builders over a shared
    SparkSession; module-level caches (e.g. probe memoization) reset on
    swap, which is the conservative direction for an A/B (each variant
    pays its own fixture costs — absorbed by the discard run)."""
    for m in [m for m in sys.modules if m.split(".")[0] == "pride_spark"]:
        del sys.modules[m]
    sys.path.insert(0, root)
    try:
        import pride_spark.registry as registry  # noqa: PLC0415
        import pride_spark.session as session  # noqa: PLC0415

        return registry, session
    finally:
        sys.path.remove(root)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref", required=True, help="git rev for variant B")
    ap.add_argument("--queries", required=True, help="comma-separated registry query names")
    ap.add_argument("--rounds", type=int, default=5, help="timed samples per variant")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument(
        "--fixtures", action="store_true",
        help="run registry.bench_fixtures() per variant first (needed only "
        "for queries that read build-once artifacts, e.g. q43)",
    )
    args = ap.parse_args()
    qnames = [q.strip() for q in args.queries.split(",") if q.strip()]

    ref_root = tempfile.mkdtemp(prefix=f"ab_{args.ref.replace('/', '_')}_")
    tar = subprocess.run(
        ["git", "-C", REPO, "archive", args.ref],
        check=True, stdout=subprocess.PIPE,
    )
    subprocess.run(["tar", "-x", "-C", ref_root], input=tar.stdout, check=True)

    variants = [("work", REPO), (args.ref, ref_root)]

    # one session for everything (created via the working tree's helper,
    # same conf as bench.py's headless profile)
    _, session0 = _load_registry(REPO)
    spark = session0.get_spark(
        "ab-bench",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.ui.retainedExecutions": "10",
            "spark.cleaner.periodicGC.interval": "15s",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.read.parquet(f"{args.sf_dir}/lineitem.parquet")
    warm.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

    samples: dict[str, dict[str, list[float]]] = {q: {v: [] for v, _ in variants} for q in qnames}
    # per (query, variant) discard run before the first timed sample,
    # same rationale as bench.py's untimed discard
    warmed: set[tuple[str, str]] = set()
    for rnd in range(args.rounds):
        for vname, vroot in variants:
            registry, session = _load_registry(vroot)
            queries = registry.queries()
            if args.fixtures:
                for fname, ffn in registry.bench_fixtures().items():
                    # fixtures are idempotent build-once artifacts; run
                    # them outside every timed window
                    if (fname, vname) not in warmed:
                        ffn(spark, args.sf_dir)
                        warmed.add((fname, vname))
            for q in qnames:
                if q not in queries:
                    raise SystemExit(f"query {q!r} not in {vname} registry")
                if (q, vname) not in warmed:
                    queries[q](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                    warmed.add((q, vname))
                    session.release_cached_state(spark)
                t0 = time.time()
                queries[q](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                samples[q][vname].append(time.time() - t0)
                session.release_cached_state(spark)
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
                time.sleep(0.2)
        print(f"# round {rnd + 1}/{args.rounds} done", file=sys.stderr)

    out: dict = {"sf_dir": args.sf_dir, "rounds": args.rounds, "variants": [v for v, _ in variants], "queries": {}}
    for q in qnames:
        row: dict = {}
        for vname, _ in variants:
            s = sorted(samples[q][vname])
            row[vname] = {
                "best": round(s[0], 3),
                "median": round(statistics.median(s), 3),
                "samples": [round(x, 3) for x in s],
            }
        a, b = (row[v]["best"] for v, _ in variants)
        row["work_over_ref_best"] = round(a / b, 3) if b > 0 else None
        out["queries"][q] = row
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
