"""Explicit StructType schemas for every record type of the engine.

The reference defines these as Java bean classes serialized with Jackson
(SURVEY §1; builder call sites at
``/root/reference/src/.../services/PrideAnalysisAssayService.java:710-738``
(T1), ``:740-758`` (T2), ``:968-983`` (T3)).  There is no schema inference
anywhere in this engine: every reader passes one of these explicitly.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# T4 — Param / CvParam: the universal key-value attribute struct.
# Ref: constructed throughout, e.g. PrideAnalysisAssayService.java:347,450-451.
# ---------------------------------------------------------------------------
PARAM = StructType(
    [
        StructField("cvLabel", StringType()),
        StructField("accession", StringType()),
        StructField("name", StringType()),
        StructField("value", StringType()),
    ]
)

#: IdentifiedModification — nested PTM struct.
#: Ref: PrideAnalysisAssayService.java:663-696 and :1007-1046.
IDENTIFIED_MODIFICATION = StructType(
    [
        StructField("neutralLoss", PARAM),
        StructField(
            "positionMap",
            ArrayType(
                StructType(
                    [
                        StructField("key", IntegerType(), False),
                        StructField("value", ArrayType(PARAM)),
                    ]
                )
            ),
        ),
        StructField("modification", PARAM),
        StructField("properties", ArrayType(PARAM)),
    ]
)

#: PeptideSpectrumOverview — nested member-PSM struct on protein evidence.
#: Ref: PrideAnalysisAssayService.java:782.
PEPTIDE_SPECTRUM_OVERVIEW = StructType(
    [
        StructField("charge", IntegerType()),
        StructField("precursorMass", DoubleType()),
        StructField("usi", StringType()),
        StructField("peptideSequence", StringType()),
        StructField("peptidoform", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# T1 — BinaryArchiveSpectrum: one row = one PSM joined with its raw spectrum.
# Ref: PrideAnalysisAssayService.java:710-738.
# ---------------------------------------------------------------------------
BINARY_ARCHIVE_SPECTRUM = StructType(
    [
        StructField("usi", StringType(), False),
        StructField("spectraUsi", StringType()),
        StructField("projectAccession", StringType()),
        StructField("reanalysisAccession", StringType()),
        StructField("assayAccession", StringType()),
        StructField("peptideSequence", StringType()),
        StructField("peptidoform", StringType()),
        StructField("isDecoy", BooleanType()),
        StructField("isValid", BooleanType()),
        StructField("retentionTime", DoubleType()),
        StructField("msLevel", IntegerType()),
        StructField("precursorCharge", IntegerType()),
        StructField("precursorMz", DoubleType()),
        StructField("masses", ArrayType(DoubleType())),
        StructField("intensities", ArrayType(DoubleType())),
        StructField("numPeaks", IntegerType()),
        StructField("missedCleavages", IntegerType()),
        StructField("modifications", ArrayType(IDENTIFIED_MODIFICATION)),
        StructField("proteinAccessions", ArrayType(StringType())),
        StructField("bestSearchEngineScore", PARAM),
        StructField("scores", ArrayType(PARAM)),
        StructField("properties", ArrayType(PARAM)),
        StructField("sampleProperties", ArrayType(PARAM)),
        StructField("qualityEstimationMethods", ArrayType(PARAM)),
    ]
)

#: T2 — SummaryArchiveSpectrum: projection of T1 without peak arrays /
#: modifications (column pruning made explicit).
#: Ref: PrideAnalysisAssayService.java:740-758; InferenceService.java:160-178.
SUMMARY_ARCHIVE_SPECTRUM = StructType(
    [f for f in BINARY_ARCHIVE_SPECTRUM.fields if f.name not in ("masses", "intensities", "modifications")]
)

#: T3 — ArchiveProteinEvidence: one row per protein accession.
#: Ref: PrideAnalysisAssayService.java:968-983.
ARCHIVE_PROTEIN_EVIDENCE = StructType(
    [
        StructField("reportedAccession", StringType(), False),
        StructField("modificationsNames", ArrayType(StringType())),
        StructField("projectAccession", StringType()),
        StructField("reanalysisAccession", StringType()),
        StructField("assayAccession", StringType()),
        StructField("isValid", BooleanType()),
        StructField("isDecoy", BooleanType()),
        StructField("numberPeptides", IntegerType()),
        StructField("numberPSMs", IntegerType()),
        StructField("bestSearchEngineScore", PARAM),
        StructField("properties", ArrayType(PARAM)),
        StructField("qualityEstimationMethods", ArrayType(PARAM)),
        StructField("psmAccessions", ArrayType(PEPTIDE_SPECTRUM_OVERVIEW)),
    ]
)

# ---------------------------------------------------------------------------
# T5 — manifests (TSV dimension tables).
# Ref: ws/PrideArchiveWebService.java:113-126; PrideAnalysisAssayService.java:161-173.
# ---------------------------------------------------------------------------
RESULT_FILE_MANIFEST = StructType(
    [
        StructField("name", StringType(), False),
        StructField("date", StringType()),
        StructField("accession", StringType()),
        StructField("ftp", StringType()),
    ]
)

RELATED_SPECTRA_MANIFEST = StructType(
    [
        StructField("resultFile", StringType(), False),
        StructField("date", StringType()),
        StructField("referenceFile", StringType()),
        StructField("fileType", StringType()),
        StructField("ftpName", StringType()),
        StructField("ftp", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Inputs of the analysis pipeline (FIXTURES.md §1–§6).
# ---------------------------------------------------------------------------

#: Parsed identification records — the input of the filter/FDR stage.
#: Ref: PIA report PSMs consumed at PrideAnalysisAssayService.java:472,497.
PSM = StructType(
    [
        StructField("psmId", StringType(), False),
        StructField("spectrumId", StringType(), False),
        StructField("sourceId", StringType()),
        StructField("spectraDataRef", StringType(), False),
        StructField("peptideSequence", StringType(), False),
        StructField(
            "modifications",
            ArrayType(
                StructType(
                    [
                        StructField("position", IntegerType()),
                        StructField("accession", StringType()),
                        StructField("name", StringType()),
                        StructField("mass", DoubleType()),
                    ]
                )
            ),
        ),
        StructField("charge", IntegerType()),
        StructField("massToCharge", DoubleType()),
        StructField("retentionTime", DoubleType()),
        StructField("missedCleavages", IntegerType()),
        StructField("isDecoy", BooleanType(), False),
        StructField("searchEngineScore", DoubleType(), False),
        StructField("proteinAccessions", ArrayType(StringType()), False),
    ]
)

#: Canonical raw-spectrum table — right side of the big join J5.
#: Ref: jmzReader Spectrum consumed at PrideAnalysisAssayService.java:581-644.
SPECTRUM = StructType(
    [
        StructField("fileName", StringType(), False),
        StructField("spectrumId", StringType()),
        StructField("spectrumIndex", IntegerType(), False),
        StructField("msLevel", IntegerType(), False),
        StructField("precursorMz", DoubleType()),
        StructField("precursorCharge", IntegerType()),
        StructField("masses", ArrayType(DoubleType()), False),
        StructField("intensities", ArrayType(DoubleType()), False),
        StructField("retentionTimeParam", StringType()),
    ]
)

#: mzIdentML SpectraData dimension.
#: Ref: PrideAnalysisAssayService.java:867-896.
SPECTRA_DATA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("location", StringType()),
        StructField("fileFormatAccession", StringType()),
        StructField("spectrumIdFormatAccession", StringType(), False),
    ]
)

#: PRIDE WS file listing dimension.  Ref: ws/PrideFile.java:12-68.
PROJECT_FILE = StructType(
    [
        StructField("accession", StringType(), False),
        StructField("fileName", StringType(), False),
        StructField("fileCategoryAccession", StringType()),
        StructField("fileCategoryValue", StringType()),
        StructField(
            "publicFileLocations",
            ArrayType(
                StructType(
                    [
                        StructField("accession", StringType()),
                        StructField("name", StringType()),
                        StructField("value", StringType()),
                    ]
                )
            ),
        ),
        StructField("publicationDate", StringType()),
    ]
)

#: Melted SDRF sample-metadata table.
#: Ref: PrideAnalysisAssayService.java:314-357.
SDRF = StructType(
    [
        StructField("dataFile", StringType(), False),
        StructField("characteristic", StringType(), False),
        StructField("value", StringType(), False),
    ]
)

#: MaraCluster output table.  Ref: PSMClusteringService.java:64-89.
CLUSTER = StructType(
    [
        StructField("spectraFile", StringType(), False),
        StructField("spectrumIndex", IntegerType(), False),
        StructField("clusterId", LongType(), False),
    ]
)
