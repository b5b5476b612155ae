"""Distributed connected components — the clustering core of the native
MaraCluster substitute (SURVEY §2.14b).

Algorithm: alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014).  Each
iteration is two groupBy-min shuffles over the (shrinking) edge list and
converges in O(log n) iterations REGARDLESS of component shape — unlike
plain min-label propagation (O(diameter), and no better with pointer
jumping when the minimum id sits at a random position, measured 16
rounds on 15-hop chains vs 4 for star contraction).

- large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u})
- small-star(u): orient edges toward the larger endpoint, then connect
  u and all its smaller neighbors to their minimum

At the fixpoint every component is a star centered on its minimum node
id; labels fall out of one final neighbor-min.

Scale notes:
- state is only the edge list, which contracts every round;
- each round's output is localCheckpoint-ed — without that the loop's
  lineage would re-execute all prior rounds (and the upstream edge
  plan) on every use;
- convergence is a (count, hash-sum) scalar pair per round — row data
  never reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _by_a() -> Window:
    # whole-partition frame: min(b) over all rows sharing ``a`` — ONE
    # shuffle, versus the groupBy+re-join formulation which exchanges the
    # edge list twice per star step
    return Window.partitionBy("a")


def _large_star(sym: DataFrame) -> DataFrame:
    """sym = both orientations.  Emit (v, min(N(u) ∪ {u})) for v > u."""
    m = F.least(F.min("b").over(_by_a()), F.col("a"))
    # no distinct here: the output feeds straight into small-star's
    # per-``a`` window, where duplicate (u,v) rows can't change the min —
    # the round's edge list is deduped once, at small-star's output
    return (
        sym.withColumn("m", m)
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient toward larger endpoint; connect u ∪ smaller-neighbors to min."""
    oriented = edges.select(
        F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
    )
    with_m = oriented.withColumn("m", F.min("b").over(_by_a()))
    links = with_m.select(F.col("b").alias("u"), F.col("m").alias("v")).union(
        with_m.select(F.col("a").alias("u"), F.col("m").alias("v"))
    )
    return links.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iterations: int = 50,
) -> DataFrame:
    """Label every node with the MIN node id of its connected component.

    ``edges`` is an undirected edge list (any orientation, duplicates and
    self-loops fine); isolated nodes appearing in the list label
    themselves.  Returns ``(node, component)``.
    """
    spark = edges.sparkSession
    base = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)  # feeds every round; cut upstream lineage
    )
    nodes = (
        base.select(F.col("u").alias("node"))
        .union(base.select(F.col("v").alias("node")))
        .distinct()
    )

    cur = base.filter(F.col("u") != F.col("v"))
    prev_sig = None
    for i in range(max_iterations):
        sym = cur.select("u", "v").union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).select(F.col("u").alias("a"), F.col("v").alias("b"))
        cur = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        # scalar-only convergence signature
        row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
        spark.sparkContext.setJobDescription(f"connected_components round {i + 1}")

    # stars: every non-root points at its root; roots label themselves
    sym = cur.select("u", "v").union(
        cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    root = (
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.first("u")).alias("component"))
        .withColumnRenamed("u", "node")
    )
    return nodes.join(root, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
