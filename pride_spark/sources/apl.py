"""Distributed APL (MaxQuant Andromeda peak list) reader → canonical
``spectra`` DataFrame.

The reference RECOGNIZES APL in its dispatch
(``SubmissionPipelineUtils.java:130-147``, CV ``MS:1002996``) but ships no
reader for it (``JmzReaderSpectrumService.java:40-55`` opens every other
format); this closes that gap.  APL is MGF-shaped text — blocks delimited
by ``peaklist start`` / ``peaklist end`` with ``key=value`` headers
(``mz``, ``charge``, ``header``, ``fragmentation``) followed by
tab-separated ``m/z<TAB>intensity`` peak lines — so the reader is the
same zero-Python pattern as :mod:`pride_spark.sources.mgf`: ``lineSep``
block split in the JVM text source, ``regexp_extract_all`` peak tables,
per-file ``row_number`` index.

Output schema (canonical ``spectra``): fileName, index, spectrumId,
msLevel, precursorMz, precursorCharge, retentionTime, masses,
intensities, numPeaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pride_spark.sources.mgf import _PEAK_RE, _header


def read_apl(spark: SparkSession, paths: str | list[str]) -> DataFrame:
    """Read one or many APL files into the canonical spectra DataFrame.

    ``spectrumId`` is the block's ``header=`` line (Andromeda's raw-file
    + index title, the closest APL has to a spectrum id); ``index`` is
    the 0-based block position within its file — the MULTI_PEAK access
    key, identical to the MGF reader's contract (S8).
    """
    raw = (
        spark.read.option("lineSep", "peaklist end")
        .text(paths)
        .withColumn("fileName", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .withColumn("__ord", F.monotonically_increasing_id())
        .filter(F.col("value").contains("peaklist start"))
    )
    block = F.col("value")
    w = Window.partitionBy("fileName").orderBy("__ord")
    masses = F.transform(
        F.regexp_extract_all(block, F.lit(_PEAK_RE), 1), lambda x: x.cast("double")
    )
    intensities = F.transform(
        F.regexp_extract_all(block, F.lit(_PEAK_RE), 2), lambda x: x.cast("double")
    )
    return raw.select(
        "fileName",
        (F.row_number().over(w) - 1).alias("index"),
        F.nullif(F.trim(_header(block, "header")), F.lit("")).alias("spectrumId"),
        F.lit(2).alias("msLevel"),  # Andromeda peak lists are MS2 fragments
        F.nullif(
            F.regexp_extract(_header(block, "mz"), r"([0-9.eE+-]+)", 1), F.lit("")
        )
        .cast("double")
        .alias("precursorMz"),
        F.nullif(F.regexp_extract(_header(block, "charge"), r"([0-9]+)", 1), F.lit(""))
        .cast("int")
        .alias("precursorCharge"),
        F.lit(None).cast("double").alias("retentionTime"),  # APL carries none
        masses.alias("masses"),
        intensities.alias("intensities"),
        F.size(masses).alias("numPeaks"),
    )
