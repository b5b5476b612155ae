"""Streaming dedup: within-stream exact dedup (bounded watermark state)
and stream-static near-dup flagging against a corpus band index."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from pride_spark.streaming.dedup import (
    corpus_band_index,
    dedup_stream_exact,
    flag_stream_corpus_dups,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while seven wizards brew strong potions under the ancient oak tree"
)

DOC_SCHEMA = "doc_id string, ts timestamp, text string"


def _drain(stream, d, name):
    q = (
        stream.writeStream.format("json")
        .option("path", f"{d}/out_{name}")
        .option("checkpointLocation", f"{d}/ck_{name}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [
        json.loads(line)
        for f in glob.glob(f"{d}/out_{name}/part-*")
        for line in open(f)
        if line.strip()
    ]


def test_dedup_stream_exact_drops_redeliveries(spark, tmp_path):
    d = str(tmp_path)
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("a1", t0, BASE),
        ("a2", t0, BASE),                       # exact re-delivery, same content
        ("b1", t0, "some other content entirely with different words"),
        ("a3", t0, BASE),                       # third copy
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(d + "/in")
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(d + "/in")
    out = _drain(dedup_stream_exact(stream, "text", "ts"), d, "exact")
    texts = sorted(r["text"][:20] for r in out)
    assert len(out) == 2  # one survivor per distinct content
    assert len({r["text"] for r in out}) == 2, texts

    # batch mode is the oracle: same survivors-by-content cardinality
    batch = spark.read.parquet(d + "/in")
    assert dedup_stream_exact(batch, "text", "ts").count() == 2


def test_flag_stream_corpus_dups_matches_batch_operator(spark, tmp_path):
    d = str(tmp_path)
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    corpus = spark.createDataFrame(
        [("c1", BASE), ("c2", "totally disjoint corpus text about spark "
                              "query planning and adaptive execution " * 3)],
        "doc_id string, text string",
    )
    index = corpus_band_index(corpus, "text", "doc_id")
    near = BASE.replace("lazy dog", "sleepy dog")
    rows = [
        ("n1", t0, BASE),        # exact copy of c1
        ("n2", t0, near),        # near-dup of c1
        ("n3", t0, "novel text with completely different vocabulary "
                   "spanning tidal resonance and orbital decay " * 3),
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(d + "/in")
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(d + "/in")
    out = _drain(
        flag_stream_corpus_dups(stream, index, "text", "doc_id", threshold=0.5),
        d,
        "flags",
    )
    flags = {(r["id"], r["match_id"]): r["jaccard"] for r in out}
    assert flags[("n1", "c1")] == 1.0
    assert 0.5 <= flags[("n2", "c1")] < 1.0
    assert not any(k[0] == "n3" for k in flags)

    # the batch run of the SAME function is the streaming oracle
    batch = spark.read.parquet(d + "/in")
    bflags = {
        (r["id"], r["match_id"]): r["jaccard"]
        for r in flag_stream_corpus_dups(
            batch, index, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert bflags == flags

    # and it agrees with the batch curation operator on the pair set
    from pride_spark.operators.curation import incremental_near_dup_flags

    cflags = {
        (r["id"], r["match_id"]): r["jaccard"]
        for r in incremental_near_dup_flags(
            batch.select("doc_id", "text"), corpus, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert cflags == flags


def test_flag_stream_corpus_dups_reads_pre_r10_index_format(spark):
    """Back-compat: a pre-r10 index carries the shingle payload on EVERY
    band row (the r10 format stores it once, on band 0).  The reader
    must flag identically against both formats."""
    from pyspark.sql import functions as F

    corpus = spark.createDataFrame(
        [("c1", BASE)], "doc_id string, text string"
    )
    new_index = corpus_band_index(corpus, "text", "doc_id")
    # reconstruct the legacy every-row format: broadcast the band-0
    # payload back onto every band row
    pay = new_index.filter(F.col("sh").isNotNull()).select(
        "corpus_id", F.col("sh").alias("__sh")
    )
    old_index = (
        new_index.drop("sh")
        .join(pay, "corpus_id")
        .select("corpus_id", "digs_c", F.col("__sh").alias("sh"), "band", "bucket")
    )
    docs = spark.createDataFrame(
        [("n1", BASE), ("n2", BASE.replace("lazy dog", "sleepy dog"))],
        "doc_id string, text string",
    )
    flag = lambda idx: {  # noqa: E731
        (r["id"], r["match_id"]): r["jaccard"]
        for r in flag_stream_corpus_dups(
            docs, idx, "text", "doc_id", threshold=0.5
        ).collect()
    }
    got_new, got_old = flag(new_index), flag(old_index)
    assert got_new == got_old
    assert got_new[("n1", "c1")] == 1.0
