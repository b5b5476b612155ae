"""PRIDE Archive REST client (SURVEY §2.1 S1/S2) — driver-side edge.

Reference: ``/root/reference/src/.../services/ws/PrideArchiveWebService.java``
(``findByAccession`` :44-71, ``findFilesByProjectAccession`` :73-91, retry
policy :36,48-69 — 5 retries × 10 s).  The WS boundary stays on the
driver (it is one HTTP call per project); results land in DataFrames with
the explicit schemas from ``pride_spark.schemas`` and every downstream
step is distributed.

The HTTP transport is injectable (``fetcher``) so tests run hermetically;
the default uses ``urllib`` against the public API base.
"""

from __future__ import annotations

import json
import time
import urllib.request
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pride_spark import schemas
from pride_spark.operators.filters import result_file_filters

#: public API base (docs/usage.md in the reference)
DEFAULT_BASE = "https://www.ebi.ac.uk/pride/ws/archive/v2"


class WebServiceError(RuntimeError):
    """All retries exhausted."""


def _default_fetcher(url: str) -> dict | list:
    with urllib.request.urlopen(url, timeout=30) as r:  # pragma: no cover
        return json.load(r)


def fetch_with_retry(
    url: str,
    fetcher: Callable[[str], dict | list] | None = None,
    max_retries: int = 5,
    sleep_s: float = 10.0,
) -> dict | list:
    """S1/S2 retry loop — 5 × 10 s, mirroring the reference policy."""
    fetcher = fetcher or _default_fetcher
    last: Exception | None = None
    for _ in range(max_retries):
        try:
            return fetcher(url)
        except Exception as ex:  # noqa: BLE001 — any transport failure retries
            last = ex
            time.sleep(sleep_s)
    raise WebServiceError(f"failed after {max_retries} retries: {url}") from last


def fetch_project(
    accession: str, fetcher=None, base: str = DEFAULT_BASE, **retry_kw
) -> dict:
    """S1 — GET ``projects/{accession}`` → PrideProject dict."""
    return fetch_with_retry(f"{base}/projects/{accession}", fetcher, **retry_kw)


def fetch_project_files(
    accession: str, fetcher=None, base: str = DEFAULT_BASE, **retry_kw
) -> list[dict]:
    """S2 — GET ``files/byProject?accession=…`` → list of PrideFile dicts."""
    return fetch_with_retry(
        f"{base}/files/byProject?accession={accession}", fetcher, **retry_kw
    )


def project_files_df(spark: SparkSession, files: list[dict]) -> DataFrame:
    """PrideFile dicts → DataFrame with the explicit PROJECT_FILE schema."""
    return spark.createDataFrame(files, schemas.PROJECT_FILE)


def result_file_manifest(files: DataFrame, project_accession: str) -> DataFrame:
    """F2/F3 + projection → the result-file manifest table (T5).

    Ref: PrideArchiveWebService.java:113-126 — keep RESULT-category files
    with an FTP public location, excluding regenerated ``pride.mztab`` /
    ``pride.mgf`` artifacts; emit (name, date, accession, ftp).
    """
    kept = result_file_filters(files)
    ftp = F.element_at(
        F.filter(
            F.col("publicFileLocations"), lambda l: l["accession"] == "PRIDE:0000469"
        ),
        1,
    )["value"]
    return kept.select(
        F.col("fileName").alias("name"),
        F.date_format(F.col("publicationDate"), "yyyy-MM-dd").alias("date"),
        F.lit(project_accession).alias("accession"),
        ftp.alias("ftp"),
    )


def related_spectra_manifest(
    spectra_data: DataFrame,
    project_files: DataFrame,
    publication_date,  # Column or literal string
) -> DataFrame:
    """J2 + K4 — the ``get-related-files`` manifest.

    Ref: ``PrideAnalysisAssayService.java:156-176`` (writer; columns
    resultFile/date/referenceFile/fileType/ftpName/ftp) over the J2
    containment relation built at ``:906-924``: each result file's
    SpectraData location basename vs the project file listing, first
    match, FTP location ``PRIDE:0000469``.

    ``spectra_data`` comes from ``sources.mzid.read_mzid_spectra_data``
    (fileName = result file, location = referenced spectra path).
    """
    from pride_spark.operators.joins import contains_first_match
    from pride_spark.sources.dispatch import file_type_by_name

    probe = spectra_data.select(
        F.col("fileName").alias("resultFile"),
        F.element_at(F.split(F.col("location"), "/"), -1).alias("referenceFile"),
    )
    dim = project_files.select(
        F.col("fileName").alias("ftpName"),
        F.element_at(
            F.filter(
                F.col("publicFileLocations"),
                lambda l: l["accession"] == "PRIDE:0000469",
            ),
            1,
        )["value"].alias("ftp"),
    )
    rel = contains_first_match(
        probe,
        dim,
        probe_text="referenceFile",
        dim_text="ftpName",
        probe_keys=["resultFile", "referenceFile"],
        order_cols=["ftpName"],
        how="left",
    )
    date = publication_date if isinstance(publication_date, Column) else F.lit(publication_date)
    return rel.select(
        "resultFile",
        date.alias("date"),
        "referenceFile",
        file_type_by_name("referenceFile").alias("fileType"),
        "ftpName",
        "ftp",
    )
