"""Protein rollup: explode + aggregate (SURVEY §2.5 X1, §2.6 A3–A10).

The reference materializes five keyed maps in ehcache
(``PrideAnalysisAssayService.java:525-530``) and iterates them in
``proteinIndexStep`` (``:938-995``); here each map is one ``groupBy`` and
the whole rollup is a single shuffle on the exploded protein accession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_protein_accessions(psms: DataFrame, col: str = "proteinAccessions") -> DataFrame:
    """X1 — one row per (PSM, protein accession); drives all protein rollups.

    Ref: PrideAnalysisAssayService.java:784-824; InferenceService.java:199-237.
    """
    return psms.withColumn("proteinAccession", F.explode(F.col(col)))


def protein_rollup(
    psm_protein: DataFrame,
    *,
    protein_col: str = "proteinAccession",
    score_col: str = "qvalue",
    better: str = "lower",
) -> DataFrame:
    """A3–A9 in one aggregation pass over the exploded PSM table.

    Produces, per protein:
      - ``psmAccessions``  — member overview structs deduped by
        peptideSequence (A3; dedup ref :948-955, TreeSet on sequence — we
        keep the best-scoring row per (protein, sequence))
      - ``bestSearchEngineScoreValue`` — min q (A4, InferenceService.java:69-83)
      - ``isDecoy`` — bool_or over members (A6, :845)
      - ``modificationsNames`` — collect_set of mod names (A7, :818-822,971)
      - ``numberPSMs`` / ``numberPeptides`` (A8, :963-964)
      - ``proteinScore`` — ``-log10(bestQ)`` formatted ###.##### (A9, :97,950-951)
    """
    # nulls LAST in both directions: a member whose score didn't parse
    # (e.g. legacy PRIDE XML) must never beat a scored row for the A3
    # representative (plain asc() is nulls-first under better='lower')
    order = (
        F.col(score_col).asc_nulls_last()
        if better == "lower"
        else F.col(score_col).desc_nulls_last()
    )
    from pyspark.sql import Window

    # ONE exchange for the whole rollup: hash-partitioning by protein
    # alone satisfies BOTH the window's (protein, peptide) clustering
    # (same-pair rows are co-located) and the final groupBy(protein) —
    # without it Spark plans two full-data shuffles (asserted in
    # test_explain_plans).  Skewed hot proteins concentrate a partition,
    # but the downstream aggregate is per-protein anyway.
    psm_protein = psm_protein.repartition(F.col(protein_col))

    # A3 dedup: best row per (protein, peptideSequence), deterministic
    # tie-break.  The representative flag rides the rows instead of a
    # filter so that ONE aggregation serves BOTH scopes: psmAccessions /
    # numberPSMs over the DEDUPED representatives (the reference's
    # TreeSet-on-sequence, :948-955), while isDecoy and
    # modificationsNames accumulate over ALL member PSMs — the
    # reference's proteinDecoys anyMatch (:845) and proteinPTMs.addAll
    # (:818-822) run per PSM before any dedup, so a decoy or a PTM seen
    # only on a non-representative PSM of the same sequence still marks
    # the protein (r10 review: aggregating those two over the deduped
    # rows flipped decoy flags and truncated protein mod lists).
    w = Window.partitionBy(protein_col, "peptideSequence").orderBy(order, F.col("usi"))
    rep = F.col("__rn") == 1
    flagged = psm_protein.withColumn("__rn", F.row_number().over(w))
    agg = flagged.groupBy(protein_col).agg(
        F.sort_array(
            # collect_list skips the NULLs the when() leaves on
            # non-representative rows — same member set as a pre-filter
            F.collect_list(
                F.when(
                    rep,
                    F.struct(
                        F.col("precursorCharge").alias("charge"),
                        F.col("precursorMz").alias("precursorMass"),
                        F.col("usi").alias("usi"),
                        F.col("peptideSequence").alias("peptideSequence"),
                        F.col("peptidoform").alias("peptidoform"),
                    ),
                )
            )
        ).alias("psmAccessions"),
        # "best" honors better=: min for q-value-like scores, max when
        # larger is better.  Over ALL rows == over the representatives
        # (each group's representative is its best row).
        (F.min if better == "lower" else F.max)(F.col(score_col)).alias(
            "bestSearchEngineScoreValue"
        ),
        F.max(F.col("isDecoy")).alias("isDecoy"),
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_list(F.col("modificationNames"))))
        ).alias("modificationsNames"),
        F.sum(rep.cast("long")).alias("numberPSMs"),
        F.countDistinct("peptideSequence").alias("numberPeptides"),
    )
    # DecimalFormat("###.#####") parity: HALF_EVEN (bround), fixed 5dp via
    # decimal cast (no scientific notation), then strip trailing zeros and
    # a bare trailing dot — format_number would round HALF_UP, pad zeros,
    # and insert locale grouping.  A best score of exactly 0 formats as
    # the reference's DecimalFormat(-log10(0)) = "∞" (Spark's log10(0) is
    # null and would silently drop the A9 field; the pipeline's A2 repair
    # means 0 only reaches library callers using raw q-values).
    score_5dp = F.bround(-F.log10(F.col("bestSearchEngineScoreValue")), 5).cast(
        "decimal(14,5)"
    )
    return agg.withColumn(
        "proteinScore",
        F.when(F.col("bestSearchEngineScoreValue") == 0, F.lit("∞")).otherwise(
            F.regexp_replace(
                F.regexp_replace(score_5dp.cast("string"), r"0+$", ""), r"\.$", ""
            )
        ),
    )


def distinguishable_categories(
    psm_protein: DataFrame,
    *,
    protein_col: str = "proteinAccession",
    peptidoform_col: str = "peptidoform",
) -> DataFrame:
    """A5 — protein inference category.

    A protein is ``distinguishable`` iff some peptidoform maps to exactly
    this one protein; else ``indistinguishable``.
    Ref: InferenceService.java:52-61 (used PrideAnalysisAssayService.java:841);
    reported under CV ``MS:1001600`` (:966).

    DELIBERATE DEVIATION (documented, r10): the reference's
    ``peptideToProteins`` lists accumulate ONE ENTRY PER PSM, so its
    ``value.size() == 1`` test means "this peptidoform was observed in
    exactly one PSM AND maps to one protein" — a protein whose unique
    peptidoform is observed twice ([P, P], size 2) can never be
    distinguishable there, i.e. the category depends on observation
    COUNT, not the peptide→protein mapping.  This engine uses the
    standard set semantics (``collect_set``: distinct proteins per
    peptidoform), which is observation-count-invariant.  Fidelity audits
    comparing A5 output should expect the engine to label MORE proteins
    distinguishable on multiply-observed unique peptidoforms.
    """
    pep_sets = (
        psm_protein.groupBy(peptidoform_col)
        .agg(F.collect_set(protein_col).alias("prots"))
        .filter(F.size("prots") == 1)
        .select(F.element_at("prots", 1).alias(protein_col))
        .distinct()
        .withColumn("__unique", F.lit(True))
    )
    proteins = psm_protein.select(protein_col).distinct()
    return proteins.join(pep_sets, protein_col, "left").select(
        protein_col,
        F.when(F.col("__unique"), F.lit("distinguishable"))
        .otherwise(F.lit("indistinguishable"))
        .alias("inferenceCategory"),
    )
