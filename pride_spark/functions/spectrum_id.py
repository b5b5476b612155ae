"""Spectrum-id normalization (SURVEY §2.10 C9/C10, §2.1 S7).

The reference repairs chaotic spectrum references per id-format at lookup
time (``/root/reference/src/.../utility/SubmissionPipelineUtils.java:
229-252`` and ``proteomics/JmzReaderSpectrumService.java:69-111``).  The
engine normalizes ONCE at ingest as pure Column expressions, after which
every spectrum lookup is a plain equi-join (SURVEY §2.1 S7 note).

Semantics reproduced:
- Mascot query / multi-peak-list ids: strip ``query=``/``index=``; an
  all-digits remainder is 0-based → +1 to 1-based.
- WIFF native ids (contain sample ∧ period ∧ cycle ∧ experiment): pass
  through untouched.
- other native ids: if any space-separated token contains ``scan=``, the
  id is that token's value; else the raw id.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_wiff_id(col: Column | str) -> Column:
    """C10 — conjunction of the four WIFF marker substrings."""
    c = _c(col)
    return (
        c.contains("sample") & c.contains("period") & c.contains("cycle") & c.contains("experiment")
    )


def normalize_query_index_id(col: Column | str) -> Column:
    """Mascot/multi-peak path: strip prefixes, 0-based → 1-based when integer."""
    stripped = F.regexp_replace(F.regexp_replace(_c(col), "query=", ""), "index=", "")
    return F.when(
        stripped.rlike(r"^\d+$"), (stripped.cast("long") + 1).cast("string")
    ).otherwise(F.lit(None).cast("string"))


def extract_scan_token(col: Column | str) -> Column:
    """Native-id path: value of the first ``scan=`` token, else the raw id."""
    c = _c(col)
    scan = F.regexp_extract(c, r"(?:^|\s)\S*scan=(\S+)", 1)
    return F.when(scan != "", scan).otherwise(c)


def normalize_spectrum_id(id_col: Column | str, id_format: Column | str) -> Column:
    """Full C9 dispatch keyed on the SpectraData id-format tag.

    ``id_format`` ∈ {'MASCOT_QUERY', 'MULTI_PEAK', 'WIFF', 'NATIVE',
    'MZML'} (derived from the SpectraData CV term at ingest).
    """
    c, fmt = _c(id_col), _c(id_format)
    return (
        F.when(fmt.isin("MASCOT_QUERY", "MULTI_PEAK"), normalize_query_index_id(c))
        .when(fmt.isin("NATIVE", "MZML") & is_wiff_id(c), c)
        .when(fmt.isin("NATIVE", "MZML"), extract_scan_token(c))
        .otherwise(c)
    )
