"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast-style blocked cross join
with the dot product computed JVM-side via ``aggregate(zip_with(...))``.
Scale path: LSH bucketing by random-hyperplane sign bits (SimHash for
vectors) so the self-join only touches same-bucket candidates, plus an
IVF-style coarse quantizer built from a sampled centroid table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two numeric arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def pair_cosine(q_vec: Column, nbr_vec: Column, q_norm: Column, nbr_norm: Column) -> Column:
    """Cosine with pre-hoisted norms — bit-identical to :func:`cosine`
    (same sqrt-of-sum fold, same division order) but the two norm folds run
    once per ROW instead of once per PAIR, cutting the per-pair work from
    three array folds to one."""
    denom = q_norm * nbr_norm
    return F.when(denom > 0, dot(q_vec, nbr_vec) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    probe: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for every probe row (default: all rows).

    The probe side is broadcast when small; the dot product runs inside
    whole-stage codegen.  O(n·m) compute but zero shuffle beyond the final
    per-probe top-k window — the right baseline to verify ANN recall
    against.  Norms are hoisted per row.  Output: (query_id, neighbor_id,
    cosine, rank).
    """
    base = df.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        l2_norm(F.col(vec_col)).alias("__nn"),
    )
    q = (probe or df).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    pairs = q.join(base, F.col("query_id") != F.col("nbr_id"))
    scored = pairs.select(
        "query_id",
        "nbr_id",
        F.round(
            pair_cosine(F.col("q_vec"), F.col("nbr_vec"), F.col("__qn"), F.col("__nn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit LSH bucket id from fixed random hyperplanes (deterministic).

    ``planes`` is a small literal matrix (seeded offline); bucket id is the
    integer formed by the sign bits of ``vec · plane_i``.
    """
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, lit_plane) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    k: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the same hyperplane bucket.

    Shuffle is on the bucket key (O(n)), the quadratic term only applies
    within buckets (expected n/2^planes each).  Recall is tunable via number
    of planes / multi-probe; verify against :func:`brute_force_topk`.
    """
    b = df.select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        l2_norm(F.col(vec_col)).alias("__nn"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    pairs = q.join(b, ["bucket"]).filter(F.col("query_id") != F.col("nbr_id"))
    scored = pairs.select(
        "query_id",
        "nbr_id",
        F.round(
            pair_cosine(F.col("q_vec"), F.col("nbr_vec"), F.col("__qn"), F.col("__nn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int | None = None,
    probe: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse quantizer → per-bucket search (scale path).

    Centroids are a deterministic sample (the ``n_centroids`` smallest
    ids — a stand-in for k-means; swap the centroid table freely).  Every
    vector is assigned to its nearest centroid (one broadcast join); a
    query probes its ``n_probe`` nearest centroid buckets and ranks only
    those candidates.  ``n_probe = n_centroids`` probes everything —
    exact results (= brute force), which is the oracle contract; smaller
    ``n_probe`` trades recall for a 1/(n_centroids/n_probe) candidate
    fraction.  All joins are equi-joins on ``centroid_id``: shuffle is
    O(n), the quadratic term only applies within probed buckets.
    """
    n_probe = n_probe or n_centroids
    cents = (
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.monotonically_increasing_id().alias("__tmp"),
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
        .drop("__tmp")
    )
    cents = F.broadcast(cents)

    # assignment: argmax cosine over the broadcast centroid table
    w_assign = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col("centroid_id")
    )
    assigned = (
        df.join(cents)
        .withColumn("__sim", cosine(F.col(vec_col), F.col("centroid_vec")))
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col).alias("nbr_id"),
            F.col(vec_col).alias("nbr_vec"),
            l2_norm(F.col(vec_col)).alias("__nn"),
            "centroid_id",
        )
    )
    q = probe if probe is not None else df
    probed = (
        q.join(cents)
        .withColumn("__sim", cosine(F.col(vec_col), F.col("centroid_vec")))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.col("__sim").desc(), F.col("centroid_id"))
            ),
        )
        .filter(F.col("__rn") <= n_probe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            l2_norm(F.col(vec_col)).alias("__qn"),
            "centroid_id",
        )
    )
    pairs = probed.join(assigned, "centroid_id").filter(F.col("query_id") != F.col("nbr_id"))
    scored = pairs.select(
        "query_id",
        "nbr_id",
        F.round(
            pair_cosine(F.col("q_vec"), F.col("nbr_vec"), F.col("__qn"), F.col("__nn")), 6
        ).alias("cosine"),
    ).dropDuplicates(["query_id", "nbr_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
