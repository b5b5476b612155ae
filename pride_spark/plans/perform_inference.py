"""`perform-inference` — cluster-consensus re-scoring as one Spark job.

Reference lifecycle (SURVEY §3.2;
``/root/reference/src/.../services/InferenceService.java:85-279``):
read archive-spectra JSON + MaraCluster TSV → positional zip join →
cluster purity + best-PSM-per-cluster → re-join full records by usi →
protein rollup.  The reference needs a byte-offset index and three ehcache
tiers; here it is three joins + two groupBys + one window — a single DAG.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pride_spark.operators.cluster import best_psm_per_cluster
from pride_spark.session import register_pinned
from pride_spark.operators.joins import positional_zip_join
from pride_spark.operators.rollup import explode_protein_accessions, protein_rollup


def assign_clusters(archive: DataFrame, clusters: DataFrame) -> DataFrame:
    """J8 — positional zip: i-th archive row ↔ MaraCluster spectrumIndex i.

    Ref: InferenceService.java:94-111 — the reference zips the TSV's
    spectrumIndex against its JSON/MGF export order and IGNORES the
    TSV's spectraFile column (readMaraClusterResults returns one
    index→cluster map), because its pipeline clusters exactly ONE
    exported MGF.  This engine's positional contract is **usi order**:
    ``write_mgf(..., order_by="usi")`` (the run-pipeline /
    generate-mgf-files exports) emits records in total usi order, so
    MaraCluster's i-th spectrum IS the i-th usi-ordered archive row —
    deterministic under any partitioning, where zipping "ingest order"
    would depend on file layout.

    A TSV spanning multiple spectra files is REJECTED: spectrumIndex
    repeats per file, so the positional join would multiply rows and
    assign clusters from the wrong file (r10 review) — cluster one
    exported MGF per inference pass, as the reference does.
    """
    n_files = clusters.select("spectraFile").distinct().limit(2).count()
    if n_files > 1:
        raise ValueError(
            "MaraCluster TSV spans multiple spectra files: spectrumIndex "
            "is per-file, so a positional zip against one archive order "
            "would mis-assign clusters. Run inference per exported MGF."
        )
    return positional_zip_join(
        archive, clusters.select("spectrumIndex", "clusterId"), ["usi"], "spectrumIndex"
    )


def perform_inference(
    archive: DataFrame,
    clusters: DataFrame,
    score_col: str = "score",
    clusters_by: str = "index",
) -> dict[str, DataFrame]:
    """Full §3.2 plan.

    ``archive``: T1-shaped rows incl. ``usi, peptideSequence, peptidoform,
    isDecoy`` and a numeric ``score`` (the reference parses
    ``bestSearchEngineScore.value``, InferenceService.java:102).
    ``clusters``: MaraCluster table from ``sources.tabular.read_maracluster``
    (``clusters_by="index"``, the reference's positional contract) or the
    native ``operators.spectral_cluster`` output keyed by usi
    (``clusters_by="usi"``, SURVEY §2.14b).
    """
    if clusters_by == "usi":
        with_cluster = archive.join(clusters.select("usi", "clusterId"), "usi")
    else:
        with_cluster = assign_clusters(archive, clusters)
    # one row per cluster (bounded by #clusters); persisted because every
    # returned output consumes it — cluster_best directly, winner_spectra
    # through the semi join, protein_evidence through winners — and each
    # sink action would otherwise re-run the clustering join + window
    best = best_psm_per_cluster(
        with_cluster.select(
            "clusterId", "usi", "peptideSequence", "peptidoform", F.col(score_col).alias("score")
        ),
        score_col="score",
        better="lower",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    best = register_pinned(best)
    # J9 — re-attach the full archive record for the winning USIs.
    winners = archive.join(F.broadcast(best.select("usi")), "usi", "left_semi")
    slim = winners.select(
        "usi",
        "peptideSequence",
        "peptidoform",
        "precursorCharge",
        "precursorMz",
        "isDecoy",
        F.col(score_col).alias("qvalue"),
        "modificationNames",
        "proteinAccessions",
    )
    proteins = protein_rollup(explode_protein_accessions(slim))
    return {"cluster_best": best, "winner_spectra": winners, "protein_evidence": proteins}
