"""Remaining SURVEY §2 scalar/reshape helpers: C13, C14, C15, X2, X5.

All pure JVM Column expressions — no Python in any of them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def retention_time_fallback(
    psm_rt: Column | str,
    spectrum_cv_params: Column | str,
    *,
    nan_default: bool = True,
) -> Column:
    """C13 — psm.retentionTime, else spectrum CvParam ``MS:1000016``, else NaN.

    Ref: ``PrideAnalysisAssayService.java:631-644``.  ``spectrum_cv_params``
    is an ``array<struct<accession,value>>``; the first scan-start-time
    param wins, mirroring the reference's first-match loop.
    """
    from_cv = F.try_element_at(
        F.filter(_c(spectrum_cv_params), lambda p: p["accession"] == "MS:1000016"),
        F.lit(1),
    )["value"].cast("double")
    out = F.coalesce(_c(psm_rt).cast("double"), from_cv)
    return F.coalesce(out, F.lit(float("nan"))) if nan_default else out


def sha1_checksum(col: Column | str) -> Column:
    """C14 — SHA-1 hex digest (assay accession seed).

    Ref: ``utility/HashUtils.java:39-71``; file-level checksums hash the
    bytes (pass a ``binaryFile`` ``content`` column), row-level the string.
    """
    return F.sha1(_c(col))


def random_token() -> Column:
    """C15 — random hex token for merged assays (``HashUtils.java:73-87``).

    SHA-1 of a v4 UUID: same shape (40 hex chars), cryptographically
    seeded by the JVM, and unique per row without any driver state.
    """
    return F.sha1(F.uuid())


def peaks_to_arrays(peak_map: Column | str) -> tuple[Column, Column]:
    """X2 — peak ``map<mz,intensity>`` → sorted parallel arrays.

    Ref: ``PrideAnalysisAssayService.java:584-591`` iterates the peak map
    into ``Double[]`` masses/intensities.  Sorted by m/z so output is
    deterministic (Java HashMap order is not reproducible anyway).
    """
    m = _c(peak_map)
    entries = F.array_sort(
        F.transform(
            F.map_entries(m),
            lambda e: F.struct(e["key"].alias("mz"), e["value"].alias("i")),
        )
    )
    return (
        F.transform(entries, lambda e: e["mz"]),
        F.transform(entries, lambda e: e["i"]),
    )


def split_list(col: Column | str, sep: str = ",") -> Column:
    """X5 — comma-separated CLI list → trimmed non-empty array (explode-ready).

    Ref: ``ArchiveMoleculesIndexer.java:186-191``,
    ``PrideAnalysisAssayService.java:257``.
    """
    return F.filter(
        F.transform(F.split(_c(col), sep), lambda x: F.trim(x)), lambda x: x != ""
    )
