"""Continuous ANN serving: a stream of query embeddings searched against
the persistent IVF-PQ index must equal the batch search on the same
probes (stream == batch is the whole contract), incrementally across
availableNow drains and idempotently on replayed batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from pride_spark.operators import ann_index
from pride_spark.streaming.similarity import make_ann_batch_sink, stream_ann_search


def _corpus(spark, n=400, dim=16):
    rows = [
        (i, [((i * 31 + j * 7) % 23 - 11) / 4.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def _canon(df):
    return sorted(
        (r["query_id"], r["nbr_id"], r["rank"], round(r["cosine"], 6))
        for r in df.collect()
    )


def test_stream_ann_matches_batch_and_is_incremental(spark, tmp_path):
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    from pride_spark.operators.similarity import pq_codebooks_seeded

    ann_index.build_ivf_index(
        emb, idx, "vec_id", "embedding",
        n_centroids=4, pq_codebooks=pq_codebooks_seeded(m=4, k=8, dim=16),
    )

    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    probes1 = emb.filter(F.col("vec_id") < 10)
    probes2 = emb.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 20))
    probes1.write.mode("append").parquet(src)

    kw = dict(k=3, n_probe=4, rerank=400)
    q = stream_ann_search(
        spark.readStream.schema(emb.schema).parquet(src), idx, out, ckpt,
        available_now=True, **kw,
    )
    q.awaitTermination(120)
    got1 = spark.read.parquet(out).drop("batch_id")
    want1 = ann_index.search_ivf_pq_index(spark, idx, probes1, **kw)
    assert _canon(got1) == _canon(want1)

    # stage more probes; SAME checkpoint drains only the new file
    probes2.write.mode("append").parquet(src)
    q = stream_ann_search(
        spark.readStream.schema(emb.schema).parquet(src), idx, out, ckpt,
        available_now=True, **kw,
    )
    q.awaitTermination(120)
    got2 = spark.read.parquet(out).drop("batch_id")
    want2 = ann_index.search_ivf_pq_index(
        spark, idx, probes1.unionByName(probes2), **kw
    )
    assert _canon(got2) == _canon(want2)


def test_ann_sink_replay_overwrites_not_duplicates(spark, tmp_path):
    emb = _corpus(spark)
    idx = str(tmp_path / "idx")
    from pride_spark.operators.similarity import pq_codebooks_seeded

    ann_index.build_ivf_index(
        emb, idx, "vec_id", "embedding",
        n_centroids=4, pq_codebooks=pq_codebooks_seeded(m=4, k=8, dim=16),
    )
    out = str(tmp_path / "out")
    sink = make_ann_batch_sink(idx, out, k=3, n_probe=4, rerank=400)
    probes = emb.filter(F.col("vec_id") < 8)
    sink(probes, 0)
    once = _canon(spark.read.parquet(out).drop("batch_id"))
    sink(probes, 0)  # at-least-once replay of the SAME batch id
    twice = _canon(spark.read.parquet(out).drop("batch_id"))
    assert once == twice and once

    # float-vector IVF variant (rerank=None) also serves
    sink2 = make_ann_batch_sink(idx, str(tmp_path / "out2"), k=3, n_probe=4, rerank=None)
    sink2(probes, 0)
    got = _canon(spark.read.parquet(str(tmp_path / "out2")).drop("batch_id"))
    want = _canon(ann_index.search_ivf_index(spark, idx, probes, k=3, n_probe=4))
    assert got == want
