"""Persistent IVF ANN index — build once, search many (north-star ANN,
the production shape of :func:`pride_spark.operators.similarity.ivf_topk`).

``ivf_topk`` trains its quantizer and scans the full table per call —
right for one-shot queries, wrong for a served index over a 100 TB
embedding corpus.  This module splits the lifecycle:

- :func:`build_ivf_index` trains the deterministic spherical-k-means
  quantizer (bounded sample, driver-side Lloyd — ``similarity._kmeans_
  centroids``) and writes two parquet tables under ``path``:
  ``centroids/`` (n_centroids rows) and ``assignments/`` — every vector
  with its precomputed L2 norm, PARTITIONED BY ``centroid_id``.  The
  directory layout IS the inverted file: one partition per posting list.
- :func:`search_ivf_index` loads the centroid table (bounded, driver),
  derives each query's ``n_probe`` nearest centroid ids as pure Column
  expressions, and reads ONLY the probed partitions — the probed-cid set
  (≤ n_centroids, collected from the query side in one tiny job) becomes
  a STATIC ``isin`` filter, so the scan's ``PartitionFilters`` prune
  ``1 - n_probe/n_centroids`` of the bytes on disk before any executor
  reads them (asserted on the physical plan in
  ``tests/test_dedup_similarity_text.py``).  At 100 TB this pruning —
  not the cosine math — is the difference between a search and a scan.

Fidelity: searching with ``n_probe = n_centroids`` equals the in-memory
``ivf_topk`` (and hence brute force under full probe) — asserted in
tests.  ``assign_replicas`` multi-assignment trades storage for boundary
recall exactly as in ``ivf_topk``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pride_spark.operators.similarity import (
    _kmeans_centroids,
    _nearest_centroids_expr,
    l2_norm,
    pair_cosine,
)


def build_ivf_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_centroids: int = 16,
    assign_replicas: int = 1,
    kmeans_iters: int = 2,
) -> dict:
    """Train the quantizer and materialize the inverted file at ``path``.

    Returns the meta dict (also persisted as ``meta.json``)."""
    spark = df.sparkSession
    cents = _kmeans_centroids(df, id_col, vec_col, n_centroids, kmeans_iters)
    if not cents:
        raise ValueError("cannot build an IVF index over an empty table")
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "centroid_id int, centroid array<double>"
    )
    cent_df.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")

    nearest, order = _nearest_centroids_expr(F.col(vec_col), cents)
    bucket = (
        nearest
        if assign_replicas <= 1
        else F.explode(
            F.transform(F.slice(order, 1, assign_replicas), lambda s: s["cid"])
        )
    )
    assigned = df.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        l2_norm(F.col(vec_col)).alias("nbr_norm"),
        bucket.alias("centroid_id"),
    )
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/assignments"
    )
    meta = {
        "n_centroids": len(cents),
        "assign_replicas": assign_replicas,
        "id_type": dict(df.dtypes)[id_col],
    }
    with open(os.path.join(path.removeprefix("file:"), "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


def _load_meta(path: str) -> dict:
    with open(os.path.join(path.removeprefix("file:"), "meta.json")) as fh:
        return json.load(fh)


def search_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 3,
    n_probe: int | None = None,
) -> DataFrame:
    """Top-k cosine neighbors for every query row, reading only probed
    posting-list partitions.  Output: (query_id, nbr_id, cosine, rank)."""
    meta = _load_meta(path)
    cents_rows = (
        spark.read.parquet(f"{path}/centroids").orderBy("centroid_id").collect()
    )
    cents = [list(r["centroid"]) for r in cents_rows]
    n_probe = n_probe or meta["n_centroids"]

    _nearest, order = _nearest_centroids_expr(F.col(vec_col), cents)
    probed = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("q_norm"),
        F.explode(F.transform(F.slice(order, 1, n_probe), lambda s: s["cid"])).alias(
            "centroid_id"
        ),
    )
    # the probed-cid set is bounded by n_centroids — one tiny job turns it
    # into a STATIC partition filter the parquet scan prunes on (a join
    # would leave pruning to runtime DPP; a literal isin is unconditional)
    probe_cids = [
        r["centroid_id"] for r in probed.select("centroid_id").distinct().collect()
    ]
    assigned = spark.read.parquet(f"{path}/assignments").filter(
        F.col("centroid_id").isin(probe_cids)
    )
    pairs = probed.join(assigned, "centroid_id").filter(
        F.col("query_id") != F.col("nbr_id")
    )
    scored = pairs.select(
        "query_id",
        "nbr_id",
        F.round(
            pair_cosine(
                F.col("q_vec"), F.col("nbr_vec"), F.col("q_norm"), F.col("nbr_norm")
            ),
            6,
        ).alias("cosine"),
    )
    if meta.get("assign_replicas", 1) > 1:
        scored = scored.dropDuplicates(["query_id", "nbr_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
