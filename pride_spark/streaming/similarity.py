"""Continuous ANN serving — a stream of embeddings searched against the
persistent IVF-PQ index (north-star similarity × streaming composition).

The 100 TB serving shape: the index is built ONCE (``operators/
ann_index.build_ivf_index`` — train + encode + partition-by-centroid, a
batch job), and query traffic arrives as a stream.  Each micro-batch is
a bounded probe set, which is exactly the contract every index search
already requires — so the search itself is the UNCHANGED batch operator
(``search_ivf_index`` / ``search_ivf_pq_index``) applied per micro-batch
via ``foreachBatch``:

- the per-batch driver step that turns the probed centroid set into a
  STATIC ``PartitionFilters`` predicate (a ``collect`` over ≤
  n_centroids rows) is legal again inside ``foreachBatch``, where the
  batch frame is a plain DataFrame — the one thing a pure stream-static
  join formulation cannot express without giving up partition pruning;
- per-query top-k needs a finite window, which a streaming frame only
  gets after watermark+dedup gymnastics; per micro-batch it is the
  ordinary ``row_number`` the batch path uses.

Results append to a parquet sink (one row per (query_id, nbr_id, rank)),
with the micro-batch id stamped so replays are auditable; Structured
Streaming's checkpoint gives exactly-once batch replay into the
idempotent overwrite-by-batch-id layout.

Batch == stream equivalence is the test contract
(tests/test_streaming_ann.py): the same probe rows through the stream
sink and through the batch search must produce identical result sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_ann_batch_sink(
    index_path: str,
    output_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int | str | None = "auto",
    rerank: int | None = None,
):
    """``foreachBatch`` sink: search each micro-batch against the index,
    append results partitioned by micro-batch id.

    ``n_probe="auto"`` (default, r12 review) resolves to
    ceil(sqrt(n_centroids)) inside the searches — a full-probe default
    here would turn every micro-batch into an exact scan of the whole
    corpus, which at serving scale is precisely what the index exists
    to avoid; ``None`` still means full probe for callers that want
    exact results per batch.

    The search path dispatches on the INDEX's own meta (a plain IVF
    index — built without ``pq_codebooks`` — always takes
    :func:`~pride_spark.operators.ann_index.search_ivf_index`, whatever
    ``rerank`` says): wiring a rerank-carrying sink to a non-PQ index
    must not crash the stream on its first non-empty batch.
    ``rerank=None`` (the default since r12 — the old ``rerank=50``
    default reproduced the recall footgun the batch API fixed, 0.12
    recall@10 on the recorded sweep) uses the float-vector search on a
    PQ index too: exact cosine over the probed buckets.  Pass an
    explicit ``rerank`` to opt into the ADC shortlist, which warns
    below ``20*k`` (see ``search_ivf_pq_index``).
    Output layout ``output_path/batch_id=N/`` is overwritten per batch
    id, so a checkpoint-replayed batch rewrites its own partition
    instead of duplicating rows (idempotent under at-least-once
    delivery)."""
    from pride_spark.operators import ann_index

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):  # empty trigger: nothing to search
            return
        spark = batch_df.sparkSession
        has_pq = bool(ann_index._load_meta(index_path).get("pq_codebooks"))
        if rerank is None or not has_pq:
            hits = ann_index.search_ivf_index(
                spark, index_path, batch_df, id_col, vec_col,
                k=k, n_probe=n_probe,
            )
        else:
            hits = ann_index.search_ivf_pq_index(
                spark, index_path, batch_df, id_col, vec_col,
                k=k, n_probe=n_probe, rerank=rerank,
            )
        hits.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "overwrite"
        ).partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(output_path)

    return _sink


def stream_ann_search(
    queries: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_probe: int | str | None = "auto",
    rerank: int | None = None,
    available_now: bool = False,
):
    """Wire a query-embedding stream into continuous ANN serving;
    returns the started query.  ``available_now=True`` drains whatever
    the source currently holds and stops — the backfill/batch-replay
    mode, same sink as the live stream."""
    sink = make_ann_batch_sink(
        index_path, output_path,
        id_col=id_col, vec_col=vec_col, k=k, n_probe=n_probe, rerank=rerank,
    )
    writer = (
        queries.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
