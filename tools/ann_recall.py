"""ANN recall/latency curve for the persistent IVF-PQ index (VERDICT r5/r6
item: "publish the recall@10-vs-exact curve over an n_probe × rerank
sweep at sf1, with a full-probe row proving exact equality").

Method
------
- Corpus: ``--sf-dir`` (default /tmp/sf1, the factor-10 stress dataset)
  embeddings table; queries = the first ``--n-queries`` vec_ids.
- Ground truth: ``brute_force_topk`` exact cosine top-k for every query
  (bounded probe set — the whitelisted pattern, never corpus×corpus).
- Index: ``build_ivf_index`` with seeded PQ codebooks (the q43 family),
  built ONCE; every sweep point reuses it — the build cost is reported
  separately, exactly like bench.py's fixture stage.
- Sweep: every (n_probe, rerank) pair; recall@k = mean per-query overlap
  of the returned id set with the exact id set; latency = wall time of
  the search plan's collect (min of ``--runs``).
- Full-probe identity: n_probe = n_centroids and rerank ≥ corpus must
  return EXACTLY the ground-truth id sets (asserted, and reported as
  the recall=1.0 anchor row).

Usage:
    python tools/ann_recall.py [--sf-dir /tmp/sf1] [--out ANN_RECALL]
        [--n-centroids 16] [--n-queries 50] [--k 10] [--runs 2]

Writes ``<out>.json`` and ``<out>.md`` at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--out", default="ANN_RECALL")
    ap.add_argument("--n-centroids", type=int, default=16)
    ap.add_argument("--n-queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--pq-m", type=int, default=4)
    ap.add_argument("--pq-k", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pride_spark.operators import ann_index, similarity
    from pride_spark.session import get_spark

    spark = get_spark("ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n_corpus = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    probe = emb.filter(F.col("vec_id") < args.n_queries)

    # ground truth (exact cosine top-k per query)
    t0 = time.time()
    exact_rows = similarity.brute_force_topk(
        emb, "vec_id", "embedding", k=args.k, probe=probe
    ).collect()
    t_exact = round(time.time() - t0, 2)
    truth: dict[int, set] = {}
    for r in exact_rows:
        truth.setdefault(r["query_id"], set()).add(r["nbr_id"])

    # build the IVF-PQ index once (reported separately, never in a row)
    books = similarity.pq_codebooks_seeded(m=args.pq_m, k=args.pq_k, dim=dim)
    idx = os.path.join(tempfile.gettempdir(), f"ann_recall_ivfpq_m{args.pq_m}k{args.pq_k}")
    import shutil

    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    ann_index.build_ivf_index(
        emb, idx, "vec_id", "embedding",
        n_centroids=args.n_centroids, pq_codebooks=books,
    )
    t_build = round(time.time() - t0, 2)

    n_probes = sorted({1, 2, 4, args.n_centroids // 2, args.n_centroids})
    reranks = [args.k, 50, 200, n_corpus]
    rows = []
    for np_ in n_probes:
        for rr in reranks:
            best = None
            got_sets: dict[int, set] = {}
            for _ in range(max(args.runs, 1)):
                t0 = time.time()
                got = ann_index.search_ivf_pq_index(
                    spark, idx, probe, "vec_id", "embedding",
                    k=args.k, n_probe=np_, rerank=rr,
                ).collect()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
                got_sets = {}
                for r in got:
                    got_sets.setdefault(r["query_id"], set()).add(r["nbr_id"])
            recall = sum(
                len(got_sets.get(q, set()) & ids) / len(ids)
                for q, ids in truth.items()
            ) / max(len(truth), 1)
            rows.append(
                {
                    "n_probe": np_,
                    "rerank": rr,
                    "recall_at_k": round(recall, 4),
                    "sec": round(best, 2),
                    "exact_match": all(
                        got_sets.get(q, set()) == ids for q, ids in truth.items()
                    ),
                }
            )
            print(f"  n_probe={np_:3d} rerank={rr:6d} "
                  f"recall@{args.k}={recall:.4f} {best:.2f}s", flush=True)

    anchor = [r for r in rows if r["n_probe"] == args.n_centroids and r["rerank"] == n_corpus]
    assert anchor and anchor[0]["exact_match"], (
        "full-probe + full-rerank row must reproduce exact top-k "
        f"(got {anchor})"
    )

    # DEFAULTS row (r12 guardrail): n_probe="auto" (ceil sqrt centroids)
    # + rerank=None (exact over probed buckets, no ADC shortlist).  The
    # guardrail contract is recall@k >= 0.8 on this family — asserted,
    # so a future default regression fails this tool.
    best = None
    got_sets = {}
    for _ in range(max(args.runs, 1)):
        t0 = time.time()
        got = ann_index.search_ivf_pq_index(
            spark, idx, probe, "vec_id", "embedding", k=args.k,
        ).collect()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
        got_sets = {}
        for r in got:
            got_sets.setdefault(r["query_id"], set()).add(r["nbr_id"])
    d_recall = sum(
        len(got_sets.get(q, set()) & ids) / len(ids) for q, ids in truth.items()
    ) / max(len(truth), 1)
    defaults_row = {
        "n_probe": "auto(ceil sqrt)",
        "rerank": "none(exact-over-probed)",
        "recall_at_k": round(d_recall, 4),
        "sec": round(best, 2),
        "exact_match": all(got_sets.get(q, set()) == ids for q, ids in truth.items()),
    }
    rows.append(defaults_row)
    print(f"  DEFAULTS          recall@{args.k}={d_recall:.4f} {best:.2f}s", flush=True)
    assert d_recall >= 0.8, (
        f"default-knob recall {d_recall:.3f} fell below the 0.8 guardrail"
    )

    # ------------------------------------------------------------------
    # PLAIN IVF family (r12 verdict task #6): search_ivf_index has no
    # rerank knob — scoring is always exact cosine over the probed
    # buckets — so its only recall lever is n_probe.  Sweep it on the
    # same corpus/truth, anchor full-probe == exact, and assert the
    # SAME >= 0.8 defaults guardrail (n_probe="auto") as the PQ family.
    # ------------------------------------------------------------------
    idx_plain = os.path.join(
        tempfile.gettempdir(), f"ann_recall_ivf_plain_c{args.n_centroids}"
    )
    shutil.rmtree(idx_plain, ignore_errors=True)
    t0 = time.time()
    ann_index.build_ivf_index(
        emb, idx_plain, "vec_id", "embedding", n_centroids=args.n_centroids,
    )
    t_build_plain = round(time.time() - t0, 2)

    def _plain_point(np_label, np_val):
        best = None
        got_sets: dict[int, set] = {}
        for _ in range(max(args.runs, 1)):
            t0 = time.time()
            got = ann_index.search_ivf_index(
                spark, idx_plain, probe, "vec_id", "embedding",
                k=args.k, n_probe=np_val,
            ).collect()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
            got_sets = {}
            for r in got:
                got_sets.setdefault(r["query_id"], set()).add(r["nbr_id"])
        recall = sum(
            len(got_sets.get(q, set()) & ids) / len(ids)
            for q, ids in truth.items()
        ) / max(len(truth), 1)
        row = {
            "n_probe": np_label,
            "recall_at_k": round(recall, 4),
            "sec": round(best, 2),
            "exact_match": all(
                got_sets.get(q, set()) == ids for q, ids in truth.items()
            ),
        }
        print(f"  [plain] n_probe={np_label!s:>15} "
              f"recall@{args.k}={recall:.4f} {best:.2f}s", flush=True)
        return row

    plain_rows = [_plain_point(np_, np_) for np_ in n_probes]
    plain_rows.append(_plain_point("auto(ceil sqrt)", "auto"))

    full = [r for r in plain_rows if r["n_probe"] == args.n_centroids]
    assert full and full[0]["exact_match"], (
        "plain-IVF full probe must reproduce exact top-k (scoring is "
        f"exact cosine; only coverage can differ) — got {full}"
    )
    d_plain = plain_rows[-1]["recall_at_k"]
    assert d_plain >= 0.8, (
        f"plain-IVF default-knob recall {d_plain:.3f} fell below the "
        "0.8 guardrail"
    )

    out = {
        "sf_dir": args.sf_dir,
        "corpus_rows": n_corpus,
        "dim": dim,
        "k": args.k,
        "n_queries": args.n_queries,
        "n_centroids": args.n_centroids,
        "pq": {"m": args.pq_m, "k": args.pq_k},
        "sec_exact_baseline": t_exact,
        "sec_index_build": t_build,
        "sec_index_build_plain": t_build_plain,
        "sweep": rows,
        "sweep_ivf_plain": plain_rows,
    }
    with open(f"{args.out}.json", "w") as fh:
        json.dump(out, fh, indent=2)

    md = [
        "# ANN recall/latency — persistent IVF-PQ index",
        "",
        f"Corpus `{args.sf_dir}` ({n_corpus:,} × {dim}d), {args.n_queries} queries, "
        f"recall@{args.k} vs exact cosine (`brute_force_topk`, {t_exact}s).",
        f"Index: {args.n_centroids} centroids, PQ m={args.pq_m} k={args.pq_k}, built once in "
        f"{t_build}s (amortized — never inside a timed search).",
        "",
        "| n_probe | rerank | recall@%d | sec | exact |" % args.k,
        "|---:|---:|---:|---:|:---|",
    ]
    for r in rows:
        md.append(
            f"| {r['n_probe']} | {r['rerank']} | {r['recall_at_k']} "
            f"| {r['sec']} | {'YES' if r['exact_match'] else ''} |"
        )
    md += [
        "",
        "## Plain IVF (no PQ) — `search_ivf_index`",
        "",
        f"Same corpus/truth; {args.n_centroids} centroids, no codebooks "
        f"(built in {t_build_plain}s).  Scoring is always exact cosine over "
        "the probed buckets, so n_probe is the only recall lever — the "
        "defaults row (n_probe=auto) carries the same ≥0.8 guardrail, "
        "asserted on every run.",
        "",
        "| n_probe | recall@%d | sec | exact |" % args.k,
        "|---:|---:|---:|:---|",
    ]
    for r in plain_rows:
        md.append(
            f"| {r['n_probe']} | {r['recall_at_k']} | {r['sec']} "
            f"| {'YES' if r['exact_match'] else ''} |"
        )
    md += [
        "",
        "The full-probe + full-rerank row returns the EXACT ground-truth id "
        "sets (asserted in tools/ann_recall.py) — the funnel loses nothing "
        "when opened fully; production settings pick a point on the curve.",
        "",
        "Non-monotone small-rerank cells (recall falling as n_probe rises at "
        "fixed rerank) are ADC-shortlist displacement, not noise: the "
        "full-rerank rows show coverage RISING with the same probe change, "
        "so the drop happens at the fixed-size shortlist cut — added "
        "buckets contribute candidates whose quantized-distance scores "
        "outrank true neighbors'.  Scale rerank with n_probe.",
        "",
    ]
    with open(f"{args.out}.md", "w") as fh:
        fh.write("\n".join(md))
    print(f"wrote {args.out}.json / {args.out}.md")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
