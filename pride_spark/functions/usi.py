"""Universal Spectrum Identifier construction (SURVEY §2.10 C3–C4).

Ref: ``utility/SubmissionPipelineUtils.java:289-305`` (buildUsi),
``:258-265`` (getSpectraUsiFromUsi); prefix constant
``utility/Constants.java:30-32`` (``mzspec``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

USI_PREFIX = "mzspec"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def build_usi(
    project: Column | str,
    file_no_ext: Column | str,
    id_kind: Column | str,
    spectrum_ref: Column | str,
    interpretation: Column | str | None = None,
) -> Column:
    """C3 — ``mzspec:{proj}:{fileNoExt}:{index|scan|nativeId}:{ref}[:{interp}]``.

    ``id_kind`` is the literal segment label (``index``/``scan``/``nativeId``)
    chosen by the file-type dispatch (SURVEY §2.1 S5).

    NULL-PROPAGATING on the required segments: a null project / file /
    ref yields a NULL usi (``concat_ws`` silently SKIPPED null segments,
    producing a plausible-looking but segment-shifted key that grouped
    unrelated PSMs downstream instead of failing visibly — r10 review).
    A null ``interpretation`` is simply omitted (the segment is optional
    by the USI spec).
    """
    sep = F.lit(":")
    base = F.concat(
        F.lit(USI_PREFIX), sep, _c(project), sep, _c(file_no_ext), sep,
        _c(id_kind), sep, _c(spectrum_ref),
    )
    if interpretation is not None:
        interp = _c(interpretation)
        return F.when(interp.isNull(), base).otherwise(
            F.concat(base, sep, interp)
        )
    return base


def spectra_usi(usi: Column | str) -> Column:
    """C4 — keep the first 5 ``:``-segments (drop the interpretation)."""
    return F.array_join(F.slice(F.split(_c(usi), ":"), 1, 5), ":")
