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
    """Write a SINGLE named TSV file at ``path`` — the reference's
    manifest is one flat file (PrideArchiveWebService.java:113-126), not
    a Spark part-file directory (r10 review).  The rows are assembled as
    raw tab-joined text (the reference's writer does no CSV quoting) and
    streamed to the driver with ``toLocalIterator`` — manifests are one
    row per submission file, so driver-side io is the right size, and it
    sidesteps the earlier scratch-dir hazard: a Spark text write to a
    driver-local temp dir silently yields NO part files on any session
    whose tasks don't share the driver's filesystem (non-local
    fs.defaultFS, multi-node cluster), producing a header-only manifest
    with no error (r10 advice).
    """
    import os
    import uuid

    header = "\t".join(cols)
    body = df.select(
        F.concat_ws(
            "\t", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
        ).alias("value")
    )
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        with open(tmp, "w", encoding="utf-8", newline="") as dst:
            dst.write(header + "\n")
            for row in body.toLocalIterator():
                dst.write(row["value"] + "\n")
        os.replace(tmp, path)  # atomic: never a torn manifest
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def write_result_file_manifest(files: DataFrame, path: str) -> None:
    df = files.withColumn("date", F.date_format("date", "yyyy-MM-dd"))
    _write_tsv(df, path, RESULT_MANIFEST_COLS)


def write_related_spectra_manifest(rel: DataFrame, path: str) -> None:
    df = rel.withColumn("date", F.date_format("date", "yyyy-MM-dd"))
    _write_tsv(df, path, RELATED_MANIFEST_COLS)
