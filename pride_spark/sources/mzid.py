"""mzIdentML reader (SURVEY §2.1 S3) — per-file XML parse on executors.

The reference delegates mzIdentML to the PIA compiler
(``/root/reference/src/.../proteomics/PIAModelerService.java:162-189``).
Here each file is parsed with the stdlib ``xml.etree`` inside an
Arrow-batched ``mapInPandas`` stage over a file-path DataFrame: one task
per file, so a submission with many result files parses in parallel and
the driver never touches XML.  (mzIdentML files are per-assay and bounded
— the reference's own unit of work — so per-file parse granularity is the
right scale trade-off; a streaming SAX variant slots in behind the same
schema if single files ever outgrow an executor.)

Output: canonical psms frame — one row per SpectrumIdentificationItem —
plus the SpectraData map needed for J4/S7.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_NS = "{http://psidev.info/psi/pi/mzIdentML/1.1}"

MZID_PSM_SCHEMA = StructType(
    [
        StructField("fileName", StringType()),
        StructField("psmId", StringType()),
        StructField("sourceId", StringType()),
        StructField("spectraDataRef", StringType()),
        StructField("peptideSequence", StringType()),
        StructField("modifications", ArrayType(
            StructType(
                [
                    StructField("position", IntegerType()),
                    StructField("accession", StringType()),
                    StructField("name", StringType()),
                ]
            )
        )),
        StructField("precursorCharge", IntegerType()),
        StructField("massToCharge", DoubleType()),
        StructField("score", DoubleType()),
        StructField("scoreAccession", StringType()),
        StructField("scoreName", StringType()),
        StructField("isDecoy", BooleanType()),
        StructField("proteinAccessions", ArrayType(StringType())),
        StructField("rank", IntegerType()),
    ]
)

SPECTRA_DATA_SCHEMA = StructType(
    [
        StructField("fileName", StringType()),
        StructField("id", StringType()),
        StructField("location", StringType()),
        StructField("idFormatAccession", StringType()),
    ]
)

#: search-engine score CV terms probed in order (first present wins)
_SCORE_ACCESSIONS = (
    "MS:1002257",  # Comet e-value
    "MS:1001330",  # X!Tandem e-value
    "MS:1001172",  # Mascot expect
    "MS:1002466",  # PeptideShaker PSM score
    "MS:1001155",  # SEQUEST xcorr
)


def _parse_one(path: str) -> tuple[list, list]:
    root = ET.parse(path.removeprefix("file:")).getroot()
    base = path.rsplit("/", 1)[-1]

    peptides: dict[str, tuple[str, list]] = {}
    for pep in root.iter(f"{_NS}Peptide"):
        seq = pep.findtext(f"{_NS}PeptideSequence") or ""
        mods = []
        for m in pep.iter(f"{_NS}Modification"):
            pos = int(m.get("location", "0"))
            cv = m.find(f"{_NS}cvParam")
            mods.append(
                (pos, cv.get("accession") if cv is not None else None,
                 cv.get("name") if cv is not None else None)
            )
        peptides[pep.get("id")] = (seq, mods)

    evidence: dict[str, tuple[str, bool]] = {}
    dbseq_acc = {d.get("id"): d.get("accession") for d in root.iter(f"{_NS}DBSequence")}
    for ev in root.iter(f"{_NS}PeptideEvidence"):
        evidence[ev.get("id")] = (
            dbseq_acc.get(ev.get("dBSequence_ref")),
            ev.get("isDecoy", "false") == "true",
        )

    spectra_data = [
        (
            base,
            sd.get("id"),
            sd.get("location"),
            (lambda f: f.find(f"{_NS}cvParam").get("accession") if f is not None and f.find(f"{_NS}cvParam") is not None else None)(
                sd.find(f"{_NS}SpectrumIDFormat")
            ),
        )
        for sd in root.iter(f"{_NS}SpectraData")
    ]

    psms = []
    for res in root.iter(f"{_NS}SpectrumIdentificationResult"):
        source_id = res.get("spectrumID")
        sd_ref = res.get("spectraData_ref")
        for item in res.iter(f"{_NS}SpectrumIdentificationItem"):
            seq, mods = peptides.get(item.get("peptide_ref"), ("", []))
            accs, decoy = [], False
            for ref in item.iter(f"{_NS}PeptideEvidenceRef"):
                acc, dec = evidence.get(ref.get("peptideEvidence_ref"), (None, False))
                if acc:
                    accs.append(acc)
                decoy = decoy or dec
            score = score_acc = score_name = None
            cvs = {
                c.get("accession"): (c.get("value"), c.get("name"))
                for c in item.iter(f"{_NS}cvParam")
            }
            for acc in _SCORE_ACCESSIONS:
                if acc in cvs:
                    score = float(cvs[acc][0])
                    score_acc, score_name = acc, cvs[acc][1]
                    break
            psms.append(
                (
                    base,
                    item.get("id"),
                    source_id,
                    sd_ref,
                    seq,
                    mods,
                    int(item.get("chargeState")) if item.get("chargeState") else None,
                    float(item.get("experimentalMassToCharge"))
                    if item.get("experimentalMassToCharge")
                    else None,
                    score,
                    score_acc,
                    score_name,
                    decoy,
                    accs,
                    int(item.get("rank")) if item.get("rank") else None,
                )
            )
    return psms, spectra_data


def _paths_df(spark: SparkSession, paths: list[str]) -> DataFrame:
    return spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        min(len(paths), 64)
    )


def read_mzid_psms(spark: SparkSession, paths: list[str]) -> DataFrame:
    """S3 — parse many mzIdentML files in parallel → canonical psms frame."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                rows.extend(_parse_one(p)[0])
            yield pd.DataFrame(rows, columns=[f.name for f in MZID_PSM_SCHEMA.fields])

    return _paths_df(spark, paths).mapInPandas(kernel, MZID_PSM_SCHEMA)


def read_mzid_spectra_data(spark: SparkSession, paths: list[str]) -> DataFrame:
    """The SpectraData dimension (J4/S7 inputs)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                rows.extend(_parse_one(p)[1])
            yield pd.DataFrame(rows, columns=[f.name for f in SPECTRA_DATA_SCHEMA.fields])

    return _paths_df(spark, paths).mapInPandas(kernel, SPECTRA_DATA_SCHEMA)
