"""End-to-end corpus curation (plans/curate_corpus.py): gate attribution,
exact + transitive near-dup collapse, drop accounting, determinism."""

from __future__ import annotations

import json
import os

import pytest

from pride_spark.plans.curate_corpus import (
    CurateConfig,
    annotate_documents,
    curate_corpus,
)

# Realistic-ish docs: enough English stopwords for detect_language and
# >= 10 tokens so quality_score's length band passes.
_BASE = (
    "the quick brown fox jumps over the lazy dog and then it runs away "
    "to the forest where it hides from the hunters for the whole day"
)
_VARIANT = _BASE + " until the evening comes"        # near-dup of _BASE
_VARIANT2 = _VARIANT + " and the night follows"      # near-dup of _VARIANT
_OTHER = (
    "completely different content about molecular spectra and peptide "
    "identification pipelines that should never match the fox story at "
    "all because it shares almost no shingles with that text"
)

def _docs(spark):
    rows = [
        (1, _BASE),
        (2, _BASE),          # exact duplicate of 1
        (3, _VARIANT),       # near-dup of 1 (chain link A~B)
        (4, _VARIANT2),      # near-dup of 3, NOT necessarily of 1 (B~C)
        (5, _OTHER),
        (6, ""),             # empty → gate
        (7, "xx yy"),        # too short → quality gate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")

def test_curate_corpus_accounting_and_transitive_collapse(spark, tmp_path):
    cfg = CurateConfig(min_quality=0.7, shingle_n=3, near_dup_threshold=0.5)
    out_dir = str(tmp_path / "curated")
    curated, report = curate_corpus(spark, _docs(spark), cfg, output_dir=out_dir)

    assert report["input_rows"] == 7
    # first-failing-gate attribution: empty text is its own bucket
    assert report["gate_drops"] == {"empty_text": 1, "quality": 1}
    assert report["exact_dup_drops"] == 1  # doc 2
    # transitive collapse: 1~3 and 3~4 form ONE component → keep doc 1
    assert report["near_dup_drops"] == 2  # docs 3 and 4
    assert sum(report["splits"].values()) == 2  # docs 1 and 5

    import glob

    files = glob.glob(os.path.join(out_dir, "split=*", "*.parquet"))
    assert files, "expected split-partitioned parquet output"
    kept = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert kept == {1, 5}
    # accounting closes: input = kept + all attributed drops
    dropped = (
        sum(report["gate_drops"].values())
        + report["exact_dup_drops"]
        + report["near_dup_drops"]
    )
    assert report["input_rows"] == dropped + sum(report["splits"].values())

def test_curate_corpus_deterministic_and_no_write(spark):
    cfg = CurateConfig(min_quality=0.7, near_dup_threshold=0.5)
    a, ra = curate_corpus(spark, _docs(spark), cfg)
    b, rb = curate_corpus(spark, _docs(spark), cfg)
    assert ra == rb
    assert sorted(a.collect()) == sorted(b.collect())
    # split labels are a pure function of (seed, id): subsetting the
    # corpus never moves a surviving row's split
    sub = _docs(spark).filter("doc_id <> 5")
    c, _ = curate_corpus(spark, sub, cfg)
    full = {r["doc_id"]: r["split"] for r in a.collect()}
    for r in c.collect():
        if r["doc_id"] in full:
            assert r["split"] == full[r["doc_id"]]

def test_curate_corpus_language_gate(spark):
    # the German doc is built from the 'de' stopword profile itself, so
    # detection is guaranteed 'de' under any tie-break — the gate
    # assertion below is unconditional
    rows = [
        (1, _BASE),
        (2, "der die und das ist der die und das ist der die und das ist"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ann = {r["doc_id"]: r["detected_lang"] for r in
           annotate_documents(docs, CurateConfig()).collect()}
    assert ann[1] == "en" and ann[2] == "de"
    cfg = CurateConfig(languages=["en"])
    _, report = curate_corpus(spark, docs, cfg)
    assert report["gate_drops"] == {"language": 1}
    assert sum(report["splits"].values()) == 1

def test_curate_corpus_cli(spark, tmp_path):
    """CLI e2e on the driver documents table: runs, writes the report,
    accounting closes."""
    from pride_spark.cli import main

    out_dir = str(tmp_path / "out")
    rc = main([
        "curate-corpus",
        "--documents", "/root/testdata/sf0.001/documents.parquet",
        "--output-dir", out_dir,
        "--min-quality", "0.3",
        "--min-tokens", "5",
        "--near-dup-threshold", "0.8",
        "--split", "train=0.8,test=0.2",
    ])
    assert rc == 0
    report = json.load(open(os.path.join(out_dir, "_curation_report.json")))
    kept = sum(report["splits"].values())
    dropped = (
        sum(report["gate_drops"].values())
        + report["exact_dup_drops"]
        + report["near_dup_drops"]
    )
    assert report["input_rows"] == kept + dropped > 0
    assert set(report["splits"]) <= {"train", "test"}
    assert spark.read.parquet(out_dir).count() == kept


# ---------------------------------------------------------------------------
# Property: the pipeline's survivor set and accounting match a brute-force
# Python oracle (exact dedup by text, near-dup components via the SAME
# verified pair semantics, lowest-id representatives, closure of counts).

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pride_spark.operators.dedup import near_dedup_minhash

_PSETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# a tiny vocabulary → frequent partial overlap → non-trivial near-dup graphs
_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
_DOC = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=14)


def _components(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@given(corpus=_CORPUS)
@_PSETTINGS
def test_curation_matches_brute_force_oracle(spark, corpus):
    cfg = CurateConfig(near_dup_threshold=0.5, shingle_n=2)
    docs = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    curated, report = curate_corpus(spark, docs, cfg)
    got = {r["doc_id"] for r in curated.collect()}

    # oracle: empty-text gate, exact dedup (min id per text), then the
    # ENGINE's verified pair list (its LSH recall is its own contract,
    # oracle-gated in q24) collapsed transitively keeping min id
    alive = {i: t for i, t in enumerate(corpus) if t}
    first = {}
    for i in sorted(alive):
        first.setdefault(alive[i], i)
    exact_kept = set(first.values())
    sub = docs.join(
        spark.createDataFrame([(i,) for i in exact_kept], "doc_id long"),
        "doc_id",
        "left_semi",
    )
    pairs = [
        (r["id_a"], r["id_b"])
        for r in near_dedup_minhash(
            sub, "text", "doc_id",
            threshold=cfg.near_dup_threshold, shingle_n=cfg.shingle_n,
        ).collect()
    ]
    comp = _components(pairs, exact_kept)
    expect = {n for n in exact_kept if comp[n] == n}
    assert got == expect
    assert report["input_rows"] == len(corpus)
    assert report["gate_drops"].get("empty_text", 0) == len(corpus) - len(alive)
    assert report["exact_dup_drops"] == len(alive) - len(exact_kept)
    assert report["near_dup_drops"] == len(exact_kept) - len(expect)
    assert sum(report["splits"].values()) == len(expect)


def test_curate_corpus_plan_has_no_nested_loop(spark):
    """Scale guard: the full curated plan contains no CartesianProduct or
    BroadcastNestedLoopJoin — every stage is hash/sort-merge shaped."""
    docs = spark.createDataFrame(
        [(i, f"{_BASE} variant {i % 3}") for i in range(20)],
        "doc_id long, text string",
    )
    curated, _ = curate_corpus(spark, docs, CurateConfig())
    plan = curated._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_curate_corpus_everything_dropped_with_output_dir(spark, tmp_path):
    """r9 review: gates that drop EVERYTHING must report kept=0, not
    crash reading back a part-file-less parquet directory."""
    docs = spark.createDataFrame([(1, ""), (2, "")], "doc_id long, text string")
    out_dir = str(tmp_path / "empty_out")
    curated, report = curate_corpus(spark, docs, CurateConfig(), output_dir=out_dir)
    assert report["gate_drops"] == {"empty_text": 2}
    assert report["splits"] == {} and report["near_dup_drops"] == 0
    assert curated.count() == 0
    assert "split" in curated.columns  # schema intact on the empty frame


def test_curate_corpus_releases_pinned_state(spark, tmp_path):
    """r9 review: with output_dir set the near-dup stage's pinned pair
    cache and CC checkpoints are released before returning (a loop of
    runs in one driver must not accumulate executor storage)."""

    def persisted_ids():
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {k for k in m.keySet().toArray()}

    docs = spark.createDataFrame(
        [(i, f"{_BASE} tail {i}") for i in range(6)], "doc_id long, text string"
    )
    before = persisted_ids()
    curated, report = curate_corpus(
        spark, docs, CurateConfig(), output_dir=str(tmp_path / "o")
    )
    # the returned frame reads the written files — usable after release
    assert curated.count() == sum(report["splits"].values()) > 0
    leaked = persisted_ids() - before
    assert leaked == set(), f"leaked persisted/checkpointed RDDs: {leaked}"


def test_curate_corpus_cli_bad_split_is_usage_error():
    """r9 review: malformed --split specs fail fast with exit code 2 and
    a clear message, before a Spark session is started."""
    from pride_spark.cli import main

    base = ["curate-corpus", "--documents", "x", "--output-dir", "y", "--split"]
    assert main(base + ["train=0.9,"]) == 2        # trailing comma
    assert main(base + ["train"]) == 2             # no '='
    assert main(base + ["train=abc"]) == 2         # non-numeric weight
    assert main(base + ["train=-1"]) == 2          # non-positive weight
    assert main(base + ["a=0.5,a=0.5"]) == 2       # duplicate name


def test_curate_corpus_null_id_gate(spark):
    """r9 review: id-less docs drop with attribution instead of crashing
    hash_split (which refuses null ids) or skewing the eval split."""
    docs = spark.createDataFrame(
        [(None, _BASE), (1, _BASE)], "doc_id long, text string"
    )
    curated, report = curate_corpus(spark, docs, CurateConfig())
    assert report["gate_drops"] == {"null_id": 1}
    assert [r["doc_id"] for r in curated.collect()] == [1]
