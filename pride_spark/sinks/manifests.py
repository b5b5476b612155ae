"""K4 — TSV manifest writers (result-file + related-spectra tables).

Reference:
``/root/reference/src/.../services/ws/PrideArchiveWebService.java:113-126``
(result-file manifest: name, date, accession, ftp) and
``PrideAnalysisAssayService.java:156-176`` (related-spectra manifest:
resultFile, date, referenceFile, fileType, ftpName, ftp).  Dates are
``yyyy-MM-dd`` (C16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESULT_MANIFEST_COLS = ["name", "date", "accession", "ftp"]
RELATED_MANIFEST_COLS = ["resultFile", "date", "referenceFile", "fileType", "ftpName", "ftp"]


def _write_tsv(df: DataFrame, path: str, cols: list[str]) -> None:
    df.select(*cols).coalesce(1).write.mode("overwrite").csv(path, sep="\t", header=True)


def write_result_file_manifest(files: DataFrame, path: str) -> None:
    df = files.withColumn("date", F.date_format("date", "yyyy-MM-dd"))
    _write_tsv(df, path, RESULT_MANIFEST_COLS)


def write_related_spectra_manifest(rel: DataFrame, path: str) -> None:
    df = rel.withColumn("date", F.date_format("date", "yyyy-MM-dd"))
    _write_tsv(df, path, RELATED_MANIFEST_COLS)
