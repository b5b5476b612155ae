"""String scalar functions — native Column expressions.

Each cites the reference implementation it reproduces (file:line under
``/root/reference/``); all are pure Catalyst expressions so they inline into
whole-stage codegen (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The 22 special characters deleted from USIs.
#: Ref: utility/SubmissionPipelineUtils.java:43-67 (cleanUsiFromSpecialCharacters).
USI_SPECIAL_CHARS = "()_ =&$@;+?{^}%]>[~<#|"


def chars(col: Column | str) -> Column:
    """Split a string into its characters (Spark's split leaves a trailing
    empty element; DuckDB's does not — filter it for cross-engine parity)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, "(?!^)"), lambda ch: ch != "")


def clean_usi_special_chars(col: Column | str) -> Column:
    """C2 — delete the reference's special-character set from a USI."""
    return F.translate(F.col(col) if isinstance(col, str) else col, USI_SPECIAL_CHARS, "")


def clean_file_name(col: Column | str) -> Column:
    """C1 — strip quotes/backslashes and trim.

    Ref: ArchiveMoleculesIndexer.java:299-307 (cleanFileName).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.translate(c, "\"'\\", ""))


def file_name_no_extension(col: Column | str) -> Column:
    """C5 — basename minus compression extension minus final extension.

    Ref: utility/SubmissionPipelineUtils.java:275-278.
    ``/a/b/run01.mzML.gz`` → ``run01``.
    """
    c = F.col(col) if isinstance(col, str) else col
    base = F.element_at(F.split(c, "/"), -1)
    base = F.regexp_replace(base, r"(?i)\.(gz|zip)$", "")
    return F.regexp_replace(base, r"\.[^.]*$", "")


def remove_charge_state(col: Column | str) -> Column:
    """C7 — drop a trailing ``/charge`` from a peptidoform.

    Ref: utility/SubmissionPipelineUtils.java:311-313.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"/\d+$", "")


def make_isobaric(col: Column | str) -> Column:
    """C8 — leucine→isoleucine substitution for isobaric comparison.

    Ref: utility/StringUtils.java:38-40 (makePeptideIsobaric).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, "L", "I")


def ftp_to_https(col: Column | str) -> Column:
    """C18 — rewrite ``ftp://`` URLs to ``https://``.

    Ref: submissions.nf:96,151.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "^ftp://", "https://")


def capitalize(col: Column | str) -> Column:
    """C19 — sentence-case (first letter upper, rest lower).

    Ref: utility/StringUtils.java:33-36.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, 2, 2147483647)))


def unimod_label_repair(accession: Column | str) -> Column:
    """C20 — derive cvLabel from the accession prefix.

    Ref: PrideAnalysisAssayService.java:684-692,1016-1018.
    """
    acc = F.col(accession) if isinstance(accession, str) else accession
    return (
        F.when(F.upper(acc).contains("UNIMOD:"), F.lit("UNIMOD"))
        .when(F.upper(acc).startswith("MS:"), F.lit("MS"))
        .otherwise(F.lit("PRIDE"))
    )
