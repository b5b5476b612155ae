"""`generate-index-files` — the reference's main query as ONE Spark job.

Reference lifecycle (SURVEY §3.1;
``/root/reference/src/.../services/PrideAnalysisAssayService.java:242-304``):
Stage 1 parse+FDR+filters → Stage 2 per-PSM spectrum join + USI + writes →
Stage 3 protein rollup.  The reference threads an untyped assayObjectMap
through hand-written loops; here each stage is a named DataFrame and the
whole thing is one lazily-planned DAG — Catalyst fuses the filter stack
into the scans, the spectrum join is the only wide exchange, and the three
outputs (T1/T2/T3) share the filtered-PSM subplan.

Scale: the filter stack runs BEFORE the PSM↔spectrum join (predicate
pushdown does what the reference's Stage-1/Stage-2 ordering hand-codes);
the join keys on (fileName, spectrumKey) — co-partitioned, AQE handles
skewed files; protein rollup shuffles the narrow T2 projection, never the
peak arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pride_spark.functions.usi import build_usi, spectra_usi
from pride_spark.operators.fdr import add_fdr_qvalue, repair_zero_qvalues, top_n_per_spectrum
from pride_spark.operators.filters import (
    peptide_length_filter,
    psm_qvalue_filter,
    source_id_filter,
)
from pride_spark.operators.rollup import explode_protein_accessions, protein_rollup


@dataclass
class IndexConfig:
    q_value_threshold: float = 0.01
    peptide_length: int = 7
    min_psms: int = 1000
    top_n_per_spectrum: int = 1
    score_better: str = "higher"
    # PIA createPSMSets: the multi-file merged path groups identical
    # identifications from different result files into one PSM SET before
    # FDR (PIAModelerService.java:111-114; the single-file path runs
    # false, :64, which this default matches)
    create_psm_sets: bool = False
    # PIA considerModifications — the SET-KEY granularity: True keys sets
    # on the peptidoform (modified variants stay distinct), False on the
    # plain sequence.  The reference's merged path runs FALSE
    # (PIAModelerService.java:124), so that is the default here; only
    # read when create_psm_sets is on.
    consider_modifications: bool = False


class AssayValidityError(ValueError):
    """F11 — assay failed the decoy/protein/minPSM gates (reference aborts
    the assay and deletes partial output; we raise before any write)."""


def stage1_filter_and_fdr(psms: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Filter stack (F5/F7/F9) + top-N + FDR/q-value windows + A2 repair.

    With ``cfg.create_psm_sets`` (the reference's merged multi-file path,
    ``PIAModelerService.java:111-114``) identical identifications from
    different result files are grouped into PSM sets FIRST, so the FDR
    denominators count each underlying identification once; provenance
    lands in ``setMembers``/``setSize``/``engineSet``, and PIA's
    Combined FDR Score is computed per engine-set combination
    (``calculateCombinedFDRScore``, :122) into ``combinedFdrScore``.
    The set key follows ``cfg.consider_modifications`` (plain sequence
    by default — the merged reference setting); the result-file
    provenance column is ``resultFile`` when present (``prepare_psms``
    overwrites ``fileName`` with the spectra file).

    CAVEAT vs PIA: the set representative and the global q-value rank
    by the RAW best member score, which assumes the merged files share
    a comparable score scale (true for same-engine re-searches and the
    multi-mzTab reanalysis shape).  For heterogeneous engines the
    cross-engine-comparable statistic is the ``combinedFdrScore`` column
    this path emits — downstream consumers that merge Mascot-with-
    X!Tandem-style submissions should rank on it."""
    out = source_id_filter(psms)
    out = peptide_length_filter(out, cfg.peptide_length)
    if cfg.create_psm_sets:
        from pride_spark.operators.fdr import combined_fdr_score, group_psm_sets

        out = group_psm_sets(
            out,
            # spectrum identity is the engine-wide (fileName, spectrumKey)
            # pair — the same key top_n_per_spectrum and the J5 join use.
            # fileName here is the spectra namespace (prepare_psms), so
            # identifications group across RESULT files but never across
            # spectra files.  NOTE: the CLI wiring currently runs one
            # spectra namespace per invocation (prepare_psms pins
            # fileName to the submission's spectra file), the same
            # per-assay shape the reference pipeline processes.
            spectrum_key_col=(
                ("fileName", "spectrumKey")
                if "fileName" in out.columns
                else "spectrumKey"
            ),
            # set-key granularity = PIA considerModifications (the merged
            # reference path runs false = plain-sequence keys, :124)
            form_col="peptidoform" if cfg.consider_modifications else None,
            consider_modifications=False,
            score_col="score",
            better=cfg.score_better,
            file_col="resultFile" if "resultFile" in out.columns else "fileName",
            # mzTab canonical frames carry no scoreAccession column (the
            # engine CV lives in the file header, not per PSM row) —
            # group_psm_sets' default would raise UNRESOLVED_COLUMN on
            # the exact multi-mzTab shape this path exists for (r10
            # review); fall back to the provenance file as the engine
            # key, which is the per-file engine distinction mzTab gives
            engine_col=(
                "scoreAccession"
                if "scoreAccession" in out.columns
                else ("resultFile" if "resultFile" in out.columns else "fileName")
            ),
        )
    out = top_n_per_spectrum(
        out,
        cfg.top_n_per_spectrum,
        spectrum_cols=("fileName", "spectrumKey"),
        score_col="score",
        better=cfg.score_better,
        tie_cols=("psmId",),
    )
    out = add_fdr_qvalue(out, "score", "isDecoy", better=cfg.score_better)
    out = repair_zero_qvalues(out)
    if cfg.create_psm_sets:
        # PIA's merged path runs calculateCombinedFDRScore after the FDR
        # pass (:122): per engine-combination q-values interpolated into
        # the cross-engine-comparable FDR score, grouped on exactly the
        # engineSet column group_psm_sets built
        out = combined_fdr_score(out, "score", "isDecoy", "engineSet",
                                 better=cfg.score_better)
    return psm_qvalue_filter(out, cfg.q_value_threshold)


def validity_gate(psms: DataFrame, filtered: DataFrame, cfg: IndexConfig) -> None:
    """F11 driver check.

    Ref semantics: decoy presence is checked on the UNFILTERED input
    (PrideAnalysisAssayService.java:440-447 — FDR is meaningless without
    decoys, and a clean q-filtered set naturally contains none), while the
    minPSMs and protein counts gate the FILTERED output (:477-480).
    """
    decoys = (
        psms.agg(F.sum(F.col("isDecoy").cast("long")).alias("d")).collect()[0]["d"] or 0
    )
    n = filtered.count()
    n_prot = (
        filtered.select(F.explode("proteinAccessions").alias("p"))
        .agg(F.countDistinct("p"))
        .collect()[0][0]
    )
    if decoys == 0 or n_prot == 0 or n < cfg.min_psms:
        raise AssayValidityError(
            f"assay gate failed: psms={n} (min {cfg.min_psms}), decoys={decoys}, proteins={n_prot}"
        )


def stage2_spectrum_join(
    filtered: DataFrame,
    spectra: DataFrame,
    project: str,
    reanalysis: str | None = None,
    id_kind: str = "index",
) -> DataFrame:
    """J5 big join + USI build (C2–C4) → T1-shaped archive spectra.

    ``reanalysis`` mirrors the reference's reanalysis semantics
    (PrideAnalysisAssayService.java:563-571): the PUBLISHED ``usi``
    carries the reanalysis accession, while ``spectraUsi`` keeps
    pointing at the ORIGINAL project's spectrum — derived from the
    project-based USI before the swap — and the rows are stamped with
    ``reanalysisAccession`` (:713,:750).
    """
    joined = filtered.join(spectra, ["fileName", "spectrumKey"], "inner")
    # reference buildUsi (SubmissionPipelineUtils.java:289-305): the file
    # segment is EXTENSION-STRIPPED and the scan-type segment is SCAN for
    # mzML spectra files, INDEX otherwise (r10 review: the extension was
    # kept and "index" hardcoded, so published USIs and the layout
    # exporter's batch file names deviated from the reference).
    # Remaining documented deviation: the validWiffId NATIVE_ID variant
    # (comma-joined nativeID values) is not emitted — C10's wiff
    # normalization resolves those ids to scan numbers upstream instead.
    from pride_spark.functions.strings import file_name_no_extension

    usi = build_usi(
        F.lit(project),
        file_name_no_extension(F.col("fileName")),
        F.lit(id_kind),
        F.col("spectrumKey").cast("string"),
    )
    # the reference's record carries the winning search-engine score as a
    # CvParam (BinaryArchiveSpectrum.bestSearchEngineScore; re-parsed at
    # InferenceService.java:102) — build it from the ingest-recorded CV
    best_param = F.struct(
        F.lit("MS").alias("cvLabel"),
        (
            F.col("scoreAccession")
            if "scoreAccession" in filtered.columns
            else F.lit(None).cast("string")
        ).alias("accession"),
        (
            F.col("scoreName")
            if "scoreName" in filtered.columns
            else F.lit("search engine score")
        ).alias("name"),
        F.col("score").cast("string").alias("value"),
    )
    out = joined.withColumn("usi", usi).withColumn(
        "spectraUsi", spectra_usi(F.col("usi"))
    )
    if reanalysis:
        out = out.withColumn(
            "usi",
            build_usi(
                F.lit(reanalysis),
                file_name_no_extension(F.col("fileName")),
                F.lit(id_kind),
                F.col("spectrumKey").cast("string"),
            ),
        ).withColumn("reanalysisAccession", F.lit(reanalysis))
    return (
        out.withColumn("numPeaks", F.size("masses"))
        .withColumn("bestSearchEngineScore", best_param)
        .withColumn("scores", F.array(best_param))
    )


def stage3_protein_rollup(archive: DataFrame) -> DataFrame:
    """X1 + A3–A9 → T3 protein evidence (narrow projection, no peak arrays)."""
    slim = archive.select(
        "usi",
        "peptideSequence",
        "peptidoform",
        "precursorCharge",
        "precursorMz",
        "isDecoy",
        "qvalue",
        "modificationNames",
        "proteinAccessions",
    )
    return protein_rollup(explode_protein_accessions(slim))


def merge_author_proteins(proteins: DataFrame, author: DataFrame) -> DataFrame:
    """Attach author-reported protein attributes (mzTab PRH/PRT rows, via
    ``plans.ingest.read_author_proteins``) onto the T3 protein-evidence
    table as an ``authorProperties`` Param array.

    The reference compiles the FULL mzTab through PIA
    (``PIAModelerService.java:162-189``), so author-supplied protein rows
    ride into its protein model; this is the Spark-side equivalent: a
    broadcast left join on accession (the author table is one row per
    protein per file — dimension-sized at any corpus scale), each
    non-null author attribute rendered as one Param, multi-file rows
    concatenated.  Engine-derived columns are never overwritten — author
    data is additive evidence, not an override."""
    from pride_spark.schemas import PARAM

    def _p(name: str, col) -> F.Column:
        return F.when(
            col.isNotNull(),
            F.struct(
                F.lit(None).cast("string").alias("cvLabel"),
                F.lit(None).cast("string").alias("accession"),
                F.lit(name).alias("name"),
                col.cast("string").alias("value"),
            ),
        )

    cols = {c: F.col(c) for c in author.columns}
    params = F.filter(
        F.array(
            _p("author protein description", cols.get("description", F.lit(None))),
            _p("species", cols.get("species", F.lit(None))),
            _p("taxid", cols.get("taxid", F.lit(None))),
            _p("protein coverage", cols.get("proteinCoverage", F.lit(None))),
            _p(
                "author best search-engine score",
                cols.get("bestSearchEngineScore", F.lit(None)),
            ),
            _p(
                "ambiguity members",
                F.when(
                    F.size(cols.get("ambiguityMembers", F.array())) > 0,
                    F.array_join(cols.get("ambiguityMembers", F.array()), ","),
                ),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    from pyspark.sql.types import ArrayType

    from pride_spark.operators.joins import broadcast_props_join

    # array_sort pins a deterministic Param order — multi-file mzTab
    # submissions contribute one row per file per accession and the
    # post-shuffle collect_list order is not reproducible otherwise
    # (sampleProperties applies the same discipline in cli._index_outputs)
    by_acc = (
        author.select(F.col("accession").alias("__acc"), params.alias("__p"))
        .groupBy("__acc")
        .agg(F.array_sort(F.flatten(F.collect_list("__p"))).alias("__props"))
    )
    return (
        broadcast_props_join(
            proteins.withColumn("__acc", F.col("proteinAccession")),
            by_acc,
            "__acc",
            "__props",
            F.array().cast(ArrayType(PARAM)),
            out_col="authorProperties",
        )
        .drop("__props", "__acc")
    )


def generate_index_files(
    psms: DataFrame,
    spectra: DataFrame,
    project: str,
    cfg: IndexConfig | None = None,
    enforce_gates: bool = True,
    reanalysis: str | None = None,
    sample_props: DataFrame | None = None,
    author_proteins: DataFrame | None = None,
    id_kind: str = "index",
) -> dict[str, DataFrame]:
    """Full §3.1 plan; returns the three output tables as DataFrames.

    Callers pick sinks (``sources.jsonlines.write_jsonlines`` for parity
    with the reference's JSON-lines outputs, parquet for the native path).

    ``reanalysis`` — reanalysis accession; see :func:`stage2_spectrum_join`.
    ``sample_props`` — per-file SDRF sample characteristics as
    ``(__skey, sampleProperties: array<Param>)`` where ``__skey`` is the
    lower-cased extension-stripped file name; broadcast-joined onto the
    archive rows (J6) with an empty-array fallback, mirroring the
    reference's localSampleProperties attachment and its
    extension-stripped sample-map key
    (PrideAnalysisAssayService.java:574-579).
    """
    cfg = cfg or IndexConfig()
    filtered = stage1_filter_and_fdr(psms, cfg)
    if enforce_gates:
        validity_gate(psms, filtered, cfg)
    archive = stage2_spectrum_join(filtered, spectra, project, reanalysis, id_kind)
    if sample_props is not None:
        from pyspark.sql.types import ArrayType

        from pride_spark.operators.joins import broadcast_props_join
        from pride_spark.schemas import PARAM

        from pride_spark.functions.strings import file_name_no_extension

        # both sides keyed by lower-cased extension-stripped name.
        # DELIBERATE DEVIATION (superset): the reference's sample-map key
        # (SubmissionPipelineUtils.getFileNameNoExtension, used at
        # PrideAnalysisAssayService.java:574-579) is CASE-SENSITIVE — when
        # SDRF and archive file names differ only by case the reference
        # attaches nothing; this engine normalizes both sides and attaches
        # the properties.  Fidelity audits comparing J6 output should
        # expect extra matches only on case-mismatched corpora.
        # SDRF rows name raw files, archive rows name spectra files
        archive = broadcast_props_join(
            archive.withColumn(
                "__skey", F.lower(file_name_no_extension(F.col("fileName")))
            ),
            sample_props.withColumnRenamed("sampleProperties", "__props"),
            "__skey",
            "__props",
            F.array().cast(ArrayType(PARAM)),
        ).drop("__props", "__skey")
    out = {}
    # PSM-set provenance (merged multi-file path) is published as its OWN
    # table: T1/T2 keep field-name parity with the reference's records —
    # the layout exporter's documented contract — instead of leaking
    # setMembers structs and engine-internal columns into every JSON row
    set_cols = [
        c
        for c in ("setMembers", "setSize", "engineSet", "combinedFdrScore", "resultFile")
        if c in archive.columns
    ]
    if set_cols:
        # provenance AND the post-drop archive both derive from this one
        # pre-drop frame; it is exposed under "_merged_archive" so the
        # caller can persist THAT frame and serve both projections from
        # the cache — persisting only the post-drop archive left the
        # provenance write re-executing the parse+FDR+set-grouping
        # subtree once more per run (r9 advice)
        out["_merged_archive"] = archive
        out["psm_set_provenance"] = archive.select("usi", *set_cols)
        archive = archive.drop(*set_cols)
    # summary AND proteins derive from the POST-drop archive plan, so a
    # caller that persists out["archive_spectra"] serves every downstream
    # sink from the cache (Spark's CacheManager matches exact subplans)
    proteins = stage3_protein_rollup(archive)
    if author_proteins is not None:
        proteins = merge_author_proteins(proteins, author_proteins)
    summary = archive.drop("masses", "intensities")
    out.update(
        {"archive_spectra": archive, "summary_spectra": summary, "protein_evidence": proteins}
    )
    return out
