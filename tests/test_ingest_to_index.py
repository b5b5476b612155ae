"""Capstone integration: mzIdentML + MGF files → generate-index-files.

The reference's §3.1 lifecycle from RAW FILES (not pre-built frames):
parse ident file (S3) → normalize spectrum ids (C9) → read spectra (S6) →
filter/FDR → J5 join → USI → rollup.
"""

from __future__ import annotations

import textwrap

import pytest

from pyspark.sql import functions as F

from pride_spark.functions.spectrum_id import normalize_spectrum_id
from pride_spark.plans.generate_index_files import IndexConfig, generate_index_files
from pride_spark.sources.mgf import read_mgf
from pride_spark.sources.mzid import read_mzid_psms


def _mzid(n=40):
    peps, evs, results = [], [], []
    for i in range(n):
        decoy = i % 4 == 3
        acc = f"{'DECOY_' if decoy else ''}PROT{i % 5}"
        peps.append(
            f'<Peptide id="Pep_{i}"><PeptideSequence>PEPTIDEK{chr(65 + i % 3)}</PeptideSequence></Peptide>'
        )
        evs.append(
            f'<PeptideEvidence id="PE_{i}" peptide_ref="Pep_{i}" dBSequence_ref="DB_{i}" isDecoy="{str(decoy).lower()}"/>'
        )
        score = 0.9 - 0.02 * i if not decoy else 0.95
        results.append(
            f'''<SpectrumIdentificationResult id="SIR_{i}" spectrumID="index={i}" spectraData_ref="SD_1">
            <SpectrumIdentificationItem id="SII_{i}" rank="1" chargeState="2"
               experimentalMassToCharge="{400.0 + i}" peptide_ref="Pep_{i}" passThreshold="true">
              <PeptideEvidenceRef peptideEvidence_ref="PE_{i}"/>
              <cvParam accession="MS:1002257" name="e-value" value="{max(score, 0.0001)}"/>
            </SpectrumIdentificationItem></SpectrumIdentificationResult>'''
        )
    dbs = "".join(
        f'<DBSequence id="DB_{i}" accession="{"DECOY_" if i % 4 == 3 else ""}PROT{i % 5}"/>'
        for i in range(n)
    )
    return textwrap.dedent(f"""\
        <?xml version="1.0"?>
        <MzIdentML xmlns="http://psidev.info/psi/pi/mzIdentML/1.1">
          <SequenceCollection>{dbs}{''.join(peps)}{''.join(evs)}</SequenceCollection>
          <DataCollection>
            <Inputs><SpectraData id="SD_1" location="file:///data/run1.mgf">
              <SpectrumIDFormat><cvParam accession="MS:1000774" name="multiple peak list nativeID format"/></SpectrumIDFormat>
            </SpectraData></Inputs>
            <AnalysisData><SpectrumIdentificationList id="SIL_1">{''.join(results)}</SpectrumIdentificationList></AnalysisData>
          </DataCollection>
        </MzIdentML>
    """)


def _mgf(n=40):
    blocks = []
    for i in range(n):
        blocks.append(
            f"BEGIN IONS\nTITLE=spec{i}\nPEPMASS={400.0 + i}\nCHARGE=2+\n"
            f"{100.0 + i}\t10.0\n{200.0 + i}\t20.0\nEND IONS\n"
        )
    return "".join(blocks)


def test_zip_spectra_ingest_matches_plain(spark, tmp_path):
    # S14: a zipped MGF must produce bit-identical canonical spectra rows
    # to the plain file (reference decompresses .gz/.zip to an internal
    # copy before reading, SubmissionPipelineUtils.java:385-395)
    import zipfile

    from pride_spark.plans.ingest import read_spectra_any, stage_compressed

    plain = tmp_path / "run1.mgf"
    plain.write_text(_mgf())
    zpath = tmp_path / "run1.mgf.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(plain, "run1.mgf")

    stage = tmp_path / "stage"
    want = sorted(
        map(repr, read_mgf(spark, str(plain)).drop("fileName").collect())
    )
    got_df = read_spectra_any(spark, [str(zpath)], stage_dir=str(stage))
    got = sorted(map(repr, got_df.drop("fileName").collect()))
    assert got == want and len(got) == 40

    # multi-member archive fans out; non-zip paths pass through untouched
    multi = tmp_path / "two.zip"
    with zipfile.ZipFile(multi, "w") as zf:
        zf.write(plain, "a.mgf")
        zf.write(plain, "b.mgf")
    staged = stage_compressed([str(multi), str(plain)], str(tmp_path / "s2"))
    assert len(staged) == 3 and staged[-1] == str(plain)
    assert read_spectra_any(spark, staged).count() == 120


def test_files_to_index(spark, tmp_path):
    (tmp_path / "a.mzid").write_text(_mzid())
    (tmp_path / "run1.mgf").write_text(_mgf())

    psms = read_mzid_psms(spark, [str(tmp_path / "a.mzid")])
    # C9: MULTI_PEAK format → index= ids become 1-based integers; the MGF
    # reader's index is 0-based, so align to 0-based join keys.
    psms = psms.withColumn(
        "spectrumKey",
        normalize_spectrum_id("sourceId", F.lit("MULTI_PEAK")).cast("int") - 1,
    ).withColumn("fileName", F.lit("run1.mgf"))
    psms = (
        psms.withColumnRenamed("modifications", "modificationsRaw")
        .withColumn("modificationNames", F.transform("modificationsRaw", lambda m: m["name"]))
        .withColumn("peptidoform", F.concat("peptideSequence", F.lit("/2")))
        .withColumn("precursorMz", F.col("massToCharge"))
        .withColumn("sourceId2", F.col("sourceId"))
    )

    spectra = read_mgf(spark, str(tmp_path / "run1.mgf")).withColumnRenamed(
        "index", "spectrumKey"
    ).select("fileName", "spectrumKey", "masses", "intensities")

    out = generate_index_files(
        psms,
        spectra,
        "PXD777",
        IndexConfig(min_psms=5, q_value_threshold=0.1, score_better="lower"),
    )
    archive = out["archive_spectra"].collect()
    assert len(archive) > 0
    for r in archive:
        assert r["usi"].startswith("mzspec:PXD777:run1:index:")
        assert len(r["masses"]) == 2
        assert not r["isDecoy"]  # decoy block has FDR 0.33 > 0.1 threshold
    prot = out["protein_evidence"].collect()
    assert {r["proteinAccession"] for r in prot} <= {f"PROT{i}" for i in range(5)}
    # A3: members are deduped by peptideSequence per protein (TreeSet
    # semantics, PrideAnalysisAssayService.java:948-955) — so numberPSMs
    # counts distinct (protein, sequence) pairs, not raw archive rows.
    n_pairs = len({(p, r["peptideSequence"]) for r in archive for p in r["proteinAccessions"]})
    assert sum(r["numberPSMs"] for r in prot) == n_pairs

def _pridexml(n=40):
    import base64
    import struct

    spectra = []
    for i in range(n):
        peaks = [(100.0 + i, 10.0), (200.0 + i, 20.0)]
        mz_b64 = base64.b64encode(struct.pack("<2d", *[p[0] for p in peaks])).decode()
        it_b64 = base64.b64encode(struct.pack("<2d", *[p[1] for p in peaks])).decode()
        spectra.append(
            f'''<spectrum id="{i + 1}">
             <spectrumDesc><spectrumSettings>
              <spectrumInstrument msLevel="2"/>
             </spectrumSettings>
             <precursorList count="1"><precursor msLevel="1" spectrumRef="0"><ionSelection>
              <cvParam cvLabel="PSI" accession="PSI:1000040" value="{400.0 + i}"/>
              <cvParam cvLabel="PSI" accession="PSI:1000041" value="2"/>
             </ionSelection></precursor></precursorList></spectrumDesc>
             <mzArrayBinary><data precision="64" endian="little" length="2">{mz_b64}</data></mzArrayBinary>
             <intenArrayBinary><data precision="64" endian="little" length="2">{it_b64}</data></intenArrayBinary>
            </spectrum>'''
        )
    return (
        '<?xml version="1.0"?><ExperimentCollection version="2.1"><Experiment>'
        f'<mzData version="1.05"><spectrumList count="{n}">{"".join(spectra)}'
        "</spectrumList></mzData></Experiment></ExperimentCollection>"
    )


def test_files_to_index_pridexml(spark, tmp_path):
    # same §3.1 lifecycle as test_files_to_index but the spectra source is a
    # legacy PRIDE XML submission: NATIVE ids join on spectrumId directly.
    mzid = _mzid().replace('spectrumID="index=', 'spectrumID="')
    # _mzid emits spectrumID="index={i}"; NATIVE path uses the raw id i+1
    import re

    mzid = re.sub(r'spectrumID="(\d+)"', lambda m: f'spectrumID="{int(m.group(1)) + 1}"', mzid)
    (tmp_path / "a.mzid").write_text(mzid)
    (tmp_path / "legacy.xml").write_text(_pridexml())

    from pride_spark.plans.ingest import read_spectra_any

    psms = read_mzid_psms(spark, [str(tmp_path / "a.mzid")])
    psms = psms.withColumn(
        "spectrumKey", normalize_spectrum_id("sourceId", F.lit("NATIVE"))
    ).withColumn("fileName", F.lit("legacy.xml"))
    psms = (
        psms.withColumnRenamed("modifications", "modificationsRaw")
        .withColumn("modificationNames", F.transform("modificationsRaw", lambda m: m["name"]))
        .withColumn("peptidoform", F.concat("peptideSequence", F.lit("/2")))
        .withColumn("precursorMz", F.col("massToCharge"))
    )
    spectra = (
        read_spectra_any(spark, [str(tmp_path / "legacy.xml")])
        .withColumnRenamed("spectrumId", "spectrumKey")
        .select("fileName", "spectrumKey", "masses", "intensities")
    )
    out = generate_index_files(
        psms,
        spectra,
        "PRD000001",
        IndexConfig(min_psms=5, q_value_threshold=0.1, score_better="lower"),
    )
    archive = out["archive_spectra"].collect()
    assert len(archive) > 0
    for r in archive:
        assert r["usi"].startswith("mzspec:PRD000001:legacy:")
        assert len(r["masses"]) == 2


def test_zip_equal_basenames_do_not_collide(tmp_path):
    """Regression: members with equal basenames — within one archive's
    subdirectories or across archives — must all survive staging, and
    traversal member paths are rejected."""
    import zipfile

    from pride_spark.plans.ingest import stage_compressed

    z1 = tmp_path / "sub.zip"
    with zipfile.ZipFile(z1, "w") as zf:
        zf.writestr("run1/spectra.mgf", "A")
        zf.writestr("run2/spectra.mgf", "B")
    z2 = tmp_path / "other.zip"
    with zipfile.ZipFile(z2, "w") as zf:
        zf.writestr("spectra.mgf", "C")

    staged = stage_compressed([str(z1), str(z2)], str(tmp_path / "stage"))
    assert len(staged) == len(set(staged)) == 3
    assert sorted(open(p).read() for p in staged) == ["A", "B", "C"]
    # basenames are preserved for downstream name-based joins
    assert {p.rsplit("/", 1)[-1] for p in staged} == {"spectra.mgf"}

    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("../escape.mgf", "E")
    with pytest.raises(ValueError, match="unsafe"):
        stage_compressed([str(evil)], str(tmp_path / "stage2"))


def test_zip_relative_stage_dir_and_duplicate_members(tmp_path, monkeypatch):
    """A relative/unnormalized stage_dir must not trip the traversal
    guard, and repeated identical member paths (legal zip) each survive
    with a numeric suffix."""
    import zipfile

    from pride_spark.plans.ingest import stage_compressed

    z = tmp_path / "dup.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("x.mgf", "FIRST")
        zf.writestr("x.mgf", "SECOND")

    monkeypatch.chdir(tmp_path)
    staged = stage_compressed([str(z)], "./stage")  # unnormalized on purpose
    assert len(staged) == len(set(staged)) == 2
    assert sorted(open(p).read() for p in staged) == ["FIRST", "SECOND"]
    names = sorted(p.rsplit("/", 1)[-1] for p in staged)
    assert names == ["x-1.mgf", "x.mgf"]


def test_route_psms_to_spectra_multi_file(spark):
    """r10 review: multi-spectra-file submissions route each PSM to the
    file its SpectraData ref names (J3∘J4) — stamping file0 on all PSMs
    silently joined run2's identifications to run1's peaks."""
    import pytest

    from pride_spark.operators.joins import SpectraRelationError
    from pride_spark.plans.ingest import prepare_psms, route_psms_to_spectra

    psms = spark.createDataFrame(
        [
            ("res.mzid", "p1", "index=1", "SD_1", "PEPA", 2, 400.0, 10.0, False),
            ("res.mzid", "p2", "index=1", "SD_2", "PEPB", 2, 500.0, 20.0, False),
        ],
        "fileName string, psmId string, sourceId string, spectraDataRef string, "
        "peptideSequence string, precursorCharge int, massToCharge double, "
        "score double, isDecoy boolean",
    ).withColumn(
        "modifications",
        F.lit(None).cast("array<struct<position:int,accession:string,name:string>>"),
    )
    sd = spark.createDataFrame(
        [
            ("res.mzid", "SD_1", "file:///data/run1.mgf", None),
            ("res.mzid", "SD_2", "file:///data/run2.mgf", None),
        ],
        "fileName string, id string, location string, idFormatAccession string",
    )
    files = ["/inputs/run1.mgf", "/inputs/run2.mgf"]
    routed = route_psms_to_spectra(psms, sd, files)
    prepared = prepare_psms(routed, files[0], file_col="__specFile")
    got = {r["psmId"]: r["fileName"] for r in prepared.collect()}
    # each PSM carries ITS OWN spectra file, not file0 for all
    assert got == {"p1": "run1.mgf", "p2": "run2.mgf"}
    assert "__specFile" not in prepared.columns

    # a ref with no matching user file aborts (reference cardinality gate)
    with pytest.raises(SpectraRelationError, match="no matching spectra file"):
        route_psms_to_spectra(psms, sd, ["/inputs/run1.mgf"])

    # a PSM with a null/unknown ref aborts rather than joining wrongly
    bad = psms.withColumn(
        "spectraDataRef",
        F.when(F.col("psmId") == "p2", F.lit(None)).otherwise(F.col("spectraDataRef")),
    )
    with pytest.raises(SpectraRelationError, match="no resolvable"):
        route_psms_to_spectra(bad, sd, files)

    # two user files sharing a case-folded stem would duplicate every
    # routed PSM through the fanned-out left join — refused (r10 advice)
    with pytest.raises(SpectraRelationError, match="colliding case-folded stems"):
        route_psms_to_spectra(psms, sd, ["/inputs/run1.mgf", "/other/RUN1.mzML",
                                         "/inputs/run2.mgf"])
