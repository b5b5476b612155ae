"""End-to-end pipeline plans: generate-index-files (§3.1) and
perform-inference (§3.2) on synthetic assay fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pride_spark.plans.generate_index_files import (
    AssayValidityError,
    IndexConfig,
    generate_index_files,
)
from pride_spark.plans.perform_inference import perform_inference


def _fixture_psms(spark, n=400):
    """Synthetic PSM table: half decoys get systematically lower scores so
    FDR filtering keeps most targets."""
    rows = []
    for i in range(n):
        decoy = i % 4 == 3
        rows.append(
            (
                f"psm{i}",
                f"f{i % 2}.mgf",
                i // 2,  # spectrumKey: two files share the index space
                "PEPTIDEK" if i % 2 == 0 else "LNGPEPTIDER",
                ("PEPTIDEK" if i % 2 == 0 else "LNGPEPTIDER") + "/2",
                float(1000 - i if not decoy else 100 - i % 100),
                decoy,
                f"index={i // 2}",
                [f"PROT{i % 10}"],
                ["Oxidation"] if i % 5 == 0 else [],
                2,
                445.5 + i,
            )
        )
    return spark.createDataFrame(
        rows,
        "psmId string, fileName string, spectrumKey int, peptideSequence string, "
        "peptidoform string, score double, isDecoy boolean, sourceId string, "
        "proteinAccessions array<string>, modificationNames array<string>, "
        "precursorCharge int, precursorMz double",
    )


def _fixture_spectra(spark, n=400):
    rows = [
        (f"f{f}.mgf", k, [100.0 + k, 200.0 + k], [1.0, 2.0], 2)
        for f in range(2)
        for k in range(n // 2)
    ]
    return spark.createDataFrame(
        rows,
        "fileName string, spectrumKey int, masses array<double>, "
        "intensities array<double>, msLevel int",
    )


def test_generate_index_files_end_to_end(spark):
    cfg = IndexConfig(min_psms=10, q_value_threshold=0.05)
    out = generate_index_files(
        _fixture_psms(spark), _fixture_spectra(spark), "PXD000001", cfg
    )
    archive = out["archive_spectra"]
    rows = archive.collect()
    assert len(rows) > 0
    # every surviving row carries a USI, spectra USI prefix, and peaks
    assert all(r["usi"].startswith("mzspec:PXD000001:") for r in rows)
    assert all(r["spectraUsi"].count(":") == 4 for r in rows)
    assert all(r["numPeaks"] == 2 for r in rows)
    # q-value filter held
    assert all(r["qvalue"] <= 0.05 for r in rows)
    # summary is archive minus peak arrays
    assert set(archive.columns) - set(out["summary_spectra"].columns) == {
        "masses",
        "intensities",
    }
    prot = {r["proteinAccession"]: r for r in out["protein_evidence"].collect()}
    assert len(prot) > 0
    for r in prot.values():
        assert r["numberPSMs"] >= r["numberPeptides"] >= 1


def test_validity_gate_aborts_bad_assay(spark):
    psms = _fixture_psms(spark).filter(~F.col("isDecoy"))  # no decoys → gate fails
    with pytest.raises(AssayValidityError, match="decoys=0"):
        generate_index_files(psms, _fixture_spectra(spark), "PXD000001", IndexConfig(min_psms=10))


def test_perform_inference_end_to_end(spark):
    # archive table ordered by usi; clusters of 2 consecutive rows
    n = 60
    rows = [
        (
            f"mzspec:PX:f1:index:{i:03d}",
            "PEPTIDEK",
            "PEPTIDEK/2",
            2,
            445.5,
            i % 7 == 0,
            0.001 * (i + 1),
            [],
            [f"PROT{i % 5}"],
        )
        for i in range(n)
    ]
    archive = spark.createDataFrame(
        rows,
        "usi string, peptideSequence string, peptidoform string, precursorCharge int, "
        "precursorMz double, isDecoy boolean, score double, "
        "modificationNames array<string>, proteinAccessions array<string>",
    )
    clusters = spark.createDataFrame(
        [("f1.mgf", i, i // 2) for i in range(n)],
        "spectraFile string, spectrumIndex int, clusterId int",
    )
    out = perform_inference(archive, clusters)
    best = out["cluster_best"].collect()
    assert len(best) == n // 2  # every 2-member cluster is pure & unanimous
    # winner of each cluster is the lower-score (earlier) member
    winners = sorted(r["usi"] for r in best)
    assert winners == [f"mzspec:PX:f1:index:{i:03d}" for i in range(0, n, 2)]
    assert out["winner_spectra"].count() == n // 2
    assert out["protein_evidence"].count() == 5


def test_stage1_psm_set_granularity_and_combined_score(spark):
    """r9: stage1 with create_psm_sets keys sets on the PLAIN sequence by
    default (the reference's merged-path considerModifications=false,
    PIAModelerService.java:124) — peptidoform variants of one sequence
    from two result files merge; consider_modifications=True keeps them
    distinct; and the merged path emits combinedFdrScore."""
    from pride_spark.plans.generate_index_files import IndexConfig, stage1_filter_and_fdr

    rows = []
    for i in range(40):  # background population so FDR has decoys
        decoy = i % 4 == 3
        rows.append((f"bg{i}", f"r{i % 2}.mzid", "run1.mgf", 100 + i,
                     "LNGPEPTIDER", "LNGPEPTIDER/2",
                     float(500 - i if not decoy else 50 - i), decoy,
                     f"index={100 + i}", 2))
    # the interesting pair: same spectrum + sequence, different peptidoform
    rows.append(("x1", "a.mzid", "run1.mgf", 7, "PEPTIDEK", "PEPTIDEK/2",
                 900.0, False, "index=7", 2))
    rows.append(("x2", "b.mzid", "run1.mgf", 7, "PEPTIDEK",
                 "PEP[UNIMOD:21]TIDEK/2", 800.0, False, "index=7", 2))
    df = spark.createDataFrame(
        rows,
        "psmId string, resultFile string, fileName string, spectrumKey int, "
        "peptideSequence string, peptidoform string, score double, "
        "isDecoy boolean, sourceId string, precursorCharge int",
    ).withColumn(
        "scoreAccession",
        F.concat(F.lit("MS:"), F.col("resultFile")),  # one engine per file
    )

    seq_cfg = IndexConfig(q_value_threshold=0.5, peptide_length=5,
                          create_psm_sets=True)
    out = stage1_filter_and_fdr(df, seq_cfg)
    assert "combinedFdrScore" in out.columns
    x = out.filter(F.col("spectrumKey") == 7).collect()
    assert len(x) == 1  # one SET (sequence key) -> one survivor
    assert x[0]["setSize"] == 2 and x[0]["psmId"] == "x1"  # best member

    form_cfg = IndexConfig(q_value_threshold=0.5, peptide_length=5,
                           create_psm_sets=True, consider_modifications=True)
    sets = stage1_filter_and_fdr(df, form_cfg)
    x2 = sets.filter(F.col("spectrumKey") == 7).collect()
    # two sets (peptidoform keys), then top-1-per-spectrum keeps the best
    assert len(x2) == 1 and x2[0]["setSize"] == 1 and x2[0]["psmId"] == "x1"
