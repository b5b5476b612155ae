"""Shared LSH cap/band-rebuild primitives (operators/lsh_common.py) —
the round-9 verdict's extraction of the logic previously triplicated in
dedup, curation and spectral_cluster.  Unit tests pin the helper
contract; cross-module parity tests prove all three consumers emit the
same pairs/flags they did with their inline copies (the oracle rows
q24/q48/q13-inc_dup gate the same property at sf0.01)."""

from pyspark.sql import functions as F

from pride_spark.operators.lsh_common import cap_buckets, rebuild_masked_digests


def test_cap_buckets_drops_only_oversized(spark):
    rows = [("b0", "x", i) for i in range(5)] + [("b0", "y", 10), ("b1", "x", 20)]
    df = spark.createDataFrame(rows, "band string, bucket string, id long")
    out = cap_buckets(df, ["band", "bucket"], 3).collect()
    # the 5-member (b0,x) bucket is dropped; the singletons survive
    assert sorted((r["band"], r["bucket"]) for r in out) == [("b0", "y"), ("b1", "x")]
    # None = identity (uncapped path)
    assert cap_buckets(df, ["band", "bucket"], None) is df


def test_rebuild_masked_digests_nulls_capped_bands(spark):
    # id 1 survives bands 0 and 2; id 2 survives band 1 only; carry
    # column rides through
    rows = [
        (1, 0, "d10", "pay1"),
        (1, 2, "d12", "pay1"),
        (2, 1, "d21", "pay2"),
    ]
    surv = spark.createDataFrame(rows, "id long, band int, bucket string, dg string")
    out = {
        r["id"]: (r["digs"], r["dg"])
        for r in rebuild_masked_digests(
            surv, id_cols=["id"], bands=3, carry=["dg"]
        ).collect()
    }
    assert out[1] == (["d10", None, "d12"], "pay1")
    assert out[2] == ([None, "d21", None], "pay2")


def test_dedup_cap_parity_and_fallthrough(spark):
    """The extracted helper preserves lsh_candidate_pairs' cap contract:
    a pair is lost only when EVERY agreeing band is over-cap, and
    first-collision falls through to the first surviving band."""
    from pride_spark.operators import dedup

    # 200 boilerplate-identical docs (all bands over a 50-cap) + one
    # small near-dup pair that must survive under the same cap
    boiler = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every document").alias("text"),
    )
    pair = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta"),
         (1001, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    docs = boiler.unionByName(pair)
    got = dedup.near_dedup_minhash(
        docs, "text", "doc_id", threshold=0.5, max_bucket=50
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1000, 1001)]
    # uncapped: boilerplate pairs exist (sanity that the cap did the work)
    un = dedup.near_dedup_minhash(docs, "text", "doc_id", threshold=0.5).count()
    assert un > 1000


def test_incremental_flags_cap_parity(spark):
    """incremental_near_dup_flags through the shared helper: corpus-side
    cap drops the adversarial mass, keeps the legitimate match."""
    from pride_spark.operators.curation import incremental_near_dup_flags

    corpus = spark.range(150).select(
        F.col("id").alias("doc_id"),
        F.lit("corpus boilerplate mass identical in every document").alias("text"),
    ).unionByName(
        spark.createDataFrame(
            [(900, "unique corpus document alpha beta gamma delta")],
            "doc_id long, text string",
        )
    )
    new = spark.createDataFrame(
        [(1, "unique corpus document alpha beta gamma delta"),
         (2, "corpus boilerplate mass identical in every document")],
        "doc_id long, text string",
    )
    flags = incremental_near_dup_flags(
        new, corpus, "text", "doc_id", threshold=0.5, max_bucket=50
    ).collect()
    # new doc 1 matches the surviving unique corpus doc; new doc 2's
    # only matches live in capped buckets -> dropped by contract
    assert {(r["id"], r["match_id"]) for r in flags} == {(1, 900)}
    # uncapped parity: both flagged
    unflags = incremental_near_dup_flags(
        new, corpus, "text", "doc_id", threshold=0.5
    ).select("id").distinct().collect()
    assert {r["id"] for r in unflags} == {1, 2}


def test_ann_index_api_validation(spark, tmp_path):
    """r10 review: n_probe=0/negative raise at the API boundary instead
    of silently full-probing / failing inside F.slice; an empty
    pq_codebooks list is refused at build.  r12 advice: bool sneaks past
    isinstance(int) (True == 1) and must be refused by name too."""
    import pytest

    from pride_spark.operators.ann_index import (
        build_ivf_index,
        search_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    path = str(tmp_path / "idx")
    with pytest.raises(ValueError, match="non-empty"):
        build_ivf_index(emb, path, n_centroids=4, pq_codebooks=[])
    build_ivf_index(emb, path, n_centroids=4)
    for bad in (0, -3, True, False, "sqrt"):
        with pytest.raises(ValueError, match="n_probe"):
            search_ivf_index(spark, path, emb, n_probe=bad).collect()
    # valid probe still works
    assert search_ivf_index(spark, path, emb.limit(3), k=2, n_probe=1).count() > 0
