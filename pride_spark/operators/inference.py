"""Occam's-razor protein inference — parsimony over the peptide–protein map.

Reference semantics (delegated to PIA at
``/root/reference/src/.../proteomics/PIAModelerService.java:80-96``:
``OccamsRazorInference`` over best-PSM-per-peptide; subset absorption
visible at ``PrideAnalysisAssayService.java:930``; published definition in
Uszkoreit et al., J. Proteome Res. 2015):

1. proteins with **identical peptide sets** merge into one group
   ("indistinguishable");
2. a protein whose peptide set is a **strict subset** of another's is
   absorbed ("subset");
3. a **greedy minimal cover**: repeatedly take the group explaining the
   most still-unexplained peptides until all peptides are covered; covered
   groups are the reported ("leading") proteins.

Scale shape (SURVEY §2.6 / §4): steps 1 is a pure groupBy on the peptide-
set hash.  Steps 2–3 are inherently iterative, so they run as a driver
loop — but over the *aggregated group table* (one row per distinct peptide
set), which is orders of magnitude smaller than the PSM table; at
reference scale (~800 K PSMs → ~10 K proteins) this is kilobytes.  The
expensive work (PSM → peptide→protein-set) stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

GROUP_SCHEMA = StructType(
    [
        StructField("proteinAccession", StringType(), False),
        StructField("groupId", StringType(), False),
        StructField("groupMembers", ArrayType(StringType()), False),
        StructField("peptides", ArrayType(StringType()), False),
        StructField("isLeading", BooleanType(), False),
        StructField("category", StringType(), False),
    ]
)


def peptide_protein_sets(psms: DataFrame) -> DataFrame:
    """Distributed prep: protein → sorted distinct peptide set.

    Input needs ``peptideSequence`` and ``proteinAccessions`` (array).
    One explode + one groupBy; this is the only pass over the PSM table.
    """
    return (
        psms.select(
            "peptideSequence", F.explode("proteinAccessions").alias("proteinAccession")
        )
        .groupBy("proteinAccession")
        .agg(F.sort_array(F.collect_set("peptideSequence")).alias("peptides"))
    )


def occams_razor(psms: DataFrame) -> DataFrame:
    """Full parsimony inference; returns one row per protein accession.

    ``category`` ∈ {'distinguishable', 'indistinguishable', 'subset'};
    ``isLeading`` marks proteins of groups chosen by the greedy cover.
    Deterministic: ties in the greedy step break on smallest groupId.
    """
    spark = psms.sparkSession
    grouped = (
        peptide_protein_sets(psms)
        .groupBy("peptides")
        .agg(F.sort_array(F.collect_set("proteinAccession")).alias("groupMembers"))
        .withColumn("groupId", F.element_at("groupMembers", 1))
    )
    # Driver loop input: one row per DISTINCT peptide set — compact.
    groups = [
        (r["groupId"], tuple(r["groupMembers"]), frozenset(r["peptides"]))
        for r in grouped.collect()
    ]

    # Step 2: subset absorption.
    non_subset, subset_of = [], {}
    for gid, members, peps in groups:
        absorber = next(
            (
                g2
                for g2, _, p2 in groups
                if g2 != gid and peps < p2
            ),
            None,
        )
        if absorber is not None:
            subset_of[gid] = absorber
        else:
            non_subset.append((gid, members, peps))

    # Step 3: greedy minimal cover over non-subset groups.
    uncovered = set().union(*(p for _, _, p in non_subset)) if non_subset else set()
    leading: set[str] = set()
    remaining = sorted(non_subset, key=lambda g: g[0])
    while uncovered and remaining:
        best_gain = max(len(g[2] & uncovered) for g in remaining)
        # most-uncovered-peptides first; ties break on smallest groupId
        best = min(g for g in remaining if len(g[2] & uncovered) == best_gain)
        if best_gain == 0:
            break
        leading.add(best[0])
        uncovered -= best[2]
        remaining = [g for g in remaining if g[0] != best[0]]

    rows = []
    for gid, members, peps in groups:
        cat = (
            "subset"
            if gid in subset_of
            else ("distinguishable" if len(members) == 1 else "indistinguishable")
        )
        for acc in members:
            rows.append((acc, gid, list(members), sorted(peps), gid in leading, cat))
    return spark.createDataFrame(rows, GROUP_SCHEMA)
