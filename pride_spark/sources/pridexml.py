"""Legacy PRIDE XML *identification* reader (SURVEY §2.1 S3).

The reference accepts PRIDE XML as a RESULT format — dispatch routes a
non-mzIdentML ``.xml`` to the ``PRIDE`` file type
(``utility/SubmissionPipelineUtils.java:106-128``, content sniff at
:403-421) and feeds it to the PIA compiler alongside mzid/mzTab
(``services/proteomics/PIAModelerService.java:162-189``).  PIA's PRIDE
XML parser walks ``GelFreeIdentification`` / ``TwoDimensionalIdentification``
elements and their ``PeptideItem`` children; this module re-expresses
that walk as a per-file Arrow-batched ``mapInPandas`` task producing the
SAME canonical psms frame ``read_mzid_psms`` emits (``MZID_PSM_SCHEMA``),
so everything downstream — filters, FDR, inference, the spectrum join —
is format-blind.

PRIDE XML is self-contained: the identified spectra live in the file's
own embedded mzData section (``sources/mzml.read_pridexml`` parses
them), and a ``PeptideItem``'s ``<SpectrumReference>`` names the mzData
``<spectrum id=...>``.  Precursor charge / m/z therefore come from the
referenced spectrum, not the identification — the parser streams the
mzData section first (document order guarantees it precedes the
identifications), keeping only a bounded ``id -> (mz, charge)`` map,
then emits one PSM row per ``PeptideItem``.

Scoring: PRIDE XML carries per-peptide scores as ``additional``
cvParams with engine-specific PRIDE CV terms; the probe takes the
Mascot score term first, then the first numeric cvParam whose name
contains "score", then falls back to the identification-level
``<Score>`` (the same value-preference PIA's intermediate applies).
Decoys are flagged by the PRIDE CV decoy term (``PRIDE:0000303``, the
same accession the reference checks in mzTab protein rows) on either
the peptide or its identification, or by the conventional ``DECOY_``
accession prefix.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from pride_spark.sources import xmlsplit
from pride_spark.sources.mzid import MZID_PSM_SCHEMA, _paths_df

_IDENT_TAGS = ("GelFreeIdentification", "TwoDimensionalIdentification")
_DECOY_ACC = "PRIDE:0000303"
_MASCOT_SCORE_ACC = "PRIDE:0000069"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _findtext_local(elem, name: str) -> str | None:
    """Direct-child text lookup by LOCAL name — legacy PRIDE XML appears
    both with and without a namespace."""
    for child in elem:
        if _local(child.tag) == name:
            return child.text
    return None


def _precursor_of(spec) -> tuple[float | None, int | None]:
    """mz/charge from a parsed mzData ``<spectrum>`` — same cvParam
    accessions the spectra reader uses (``mzml._pridexml_spectrum_row``)."""
    mz = z = None
    for child in spec.iter():
        if _local(child.tag) != "ionSelection":
            continue
        for p in child:
            if not p.get("value"):
                continue
            acc = p.get("accession")
            if acc in ("PSI:1000040", "MS:1000744"):
                mz = float(p.get("value"))
            elif acc in ("PSI:1000041", "MS:1000041"):
                z = int(float(p.get("value")))
    return mz, z


def _additional_cvparams(elem) -> list:
    """cvParams under a DIRECT ``<additional>`` child (not descendants —
    a PeptideItem's ModificationItems carry their own blocks)."""
    out = []
    for child in elem:
        if _local(child.tag) != "additional":
            continue
        out.extend(p for p in child if _local(p.tag) == "cvParam")
    return out


def _score_of(pep_cvs, ident_score) -> tuple[float | None, str | None, str | None]:
    for p in pep_cvs:
        if p.get("accession") == _MASCOT_SCORE_ACC and p.get("value"):
            return float(p.get("value")), p.get("accession"), p.get("name")
    for p in pep_cvs:
        name = (p.get("name") or "").lower()
        if "score" in name and p.get("value"):
            try:
                return float(p.get("value")), p.get("accession"), p.get("name")
            except ValueError:
                continue
    if ident_score is not None:
        return ident_score, None, "identification score"
    return None, None, None


def _is_decoy(acc: str | None, *cv_lists) -> bool:
    if acc and acc.upper().startswith("DECOY"):
        return True
    # any-of across every cv list: a peptide-level decoy param with value
    # '0'/'false' must not shadow an identification-level affirmative one
    for cvs in cv_lists:
        for p in cvs:
            if p.get("accession") == _DECOY_ACC:
                if (p.get("value") or "1").strip().lower() not in ("0", "false"):
                    return True
    return False


def _ident_rows(elem, base: str, counter: list[int], precursors: dict) -> Iterator[tuple]:
    acc = _findtext_local(elem, "Accession")
    ident_score_txt = _findtext_local(elem, "Score")
    try:
        ident_score = float(ident_score_txt) if ident_score_txt else None
    except ValueError:
        ident_score = None
    ident_cvs = _additional_cvparams(elem)
    for pep in elem:
        if _local(pep.tag) != "PeptideItem":
            continue
        seq = _findtext_local(pep, "Sequence") or ""
        spec_ref = _findtext_local(pep, "SpectrumReference")
        mods = []
        for m in pep:
            if _local(m.tag) != "ModificationItem":
                continue
            loc = _findtext_local(m, "ModLocation")
            macc = _findtext_local(m, "ModAccession")
            mcvs = _additional_cvparams(m)
            name = next((p.get("name") for p in mcvs if p.get("name")), macc)
            try:
                loc_i = int(loc.strip()) if loc and loc.strip() else None
            except ValueError:  # malformed legacy content — keep the mod, drop the position
                loc_i = None
            mods.append((loc_i, macc, name))
        pep_cvs = _additional_cvparams(pep)
        score, score_acc, score_name = _score_of(pep_cvs, ident_score)
        mz, z = precursors.get(spec_ref, (None, None))
        counter[0] += 1
        yield (
            base,
            f"PSM_{counter[0]}",
            spec_ref,
            None,  # self-contained: no SpectraData indirection
            seq,
            mods,
            z,
            mz,
            score,
            score_acc,
            score_name,
            _is_decoy(acc, pep_cvs, ident_cvs),
            [acc] if acc else [],
            1,
        )


def _parse_one(path: str) -> list[tuple]:
    """One streaming pass: mzData spectra precede the identifications in
    document order, so the bounded ``id -> (mz, charge)`` map is complete
    before the first Identification end-event fires.  Processed elements
    are cleared — memory is one-element-bounded plus the scalar map."""
    base = path.rsplit("/", 1)[-1]
    precursors: dict[str, tuple] = {}
    rows: list[tuple] = []
    counter = [0]
    with xmlsplit.open_xml(path) as fh:
        for _event, elem in ET.iterparse(fh, events=("end",)):
            name = _local(elem.tag)
            if name == "spectrum":
                precursors[elem.get("id")] = _precursor_of(elem)
                elem.clear()
            elif name in _IDENT_TAGS:
                rows.extend(_ident_rows(elem, base, counter, precursors))
                elem.clear()
    return rows


def _read_pridexml_psms_whole(spark: SparkSession, paths: list[str]) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                rows.extend(_parse_one(p))
            yield pd.DataFrame(rows, columns=[f.name for f in MZID_PSM_SCHEMA.fields])

    return _paths_df(spark, paths).mapInPandas(kernel, MZID_PSM_SCHEMA)


_SPLIT_SCHEMA = StructType(
    [StructField("__off", LongType()), StructField("__seq", IntegerType())]
    + list(MZID_PSM_SCHEMA.fields)
)


def _ident_split_rows(fn: str, off: int, rec: str) -> Iterator[tuple]:
    """One Identification record fragment → PSM rows tagged with the
    record's byte offset + the item's within-record sequence (together a
    total document order).  Precursor mz/charge stay NULL here — the
    split path fills them with a distributed join against the mzData
    spectra scan instead of a per-task dict."""
    elem = xmlsplit.fromstring(rec)
    counter = [0]
    for row in _ident_rows(elem, fn, counter, {}):
        yield (off, counter[0], *row)


def _read_pridexml_psms_split(spark: SparkSession, paths: list[str]) -> DataFrame:
    from pyspark.sql import functions as F

    from pride_spark.operators.joins import global_row_index
    from pride_spark.sources.mzml import read_pridexml

    out = None
    for p in paths:  # offsets order WITHIN one file; number files separately
        recs = None
        for tag in (b"GelFreeIdentification", b"TwoDimensionalIdentification"):
            df = xmlsplit.scan_df(
                spark, [p], tag, False, _ident_split_rows, _SPLIT_SCHEMA,
                with_offset=True,
            )
            recs = df if recs is None else recs.unionByName(df)
        # recover the whole-mode document-order PSM numbering with the
        # same two-pass distributed row index read_pridexml uses for
        # spectrum indices — no single-task sort
        numbered = global_row_index(recs, ("__off", "__seq"), "__idx").withColumn(
            "psmId", F.concat(F.lit("PSM_"), (F.col("__idx") + 1).cast("string"))
        )
        # precursor mz/charge live on the referenced mzData spectrum; the
        # whole-mode dict lookup becomes an equi-join against the (also
        # range-parallel) spectra scan — both sides of a giant legacy
        # file parse at cluster parallelism
        spect = read_pridexml(spark, [p]).select(
            F.col("spectrumId").alias("sourceId"),
            F.col("precursorMz").alias("__mz"),
            F.col("precursorCharge").alias("__z"),
        )
        joined = (
            numbered.drop("__off", "__seq", "__idx", "precursorCharge", "massToCharge")
            .join(spect, "sourceId", "left")
            .withColumnsRenamed({"__z": "precursorCharge", "__mz": "massToCharge"})
            .select(*[f.name for f in MZID_PSM_SCHEMA.fields])
        )
        out = joined if out is None else out.unionByName(joined)
    return out


def read_pridexml_psms(
    spark: SparkSession, paths: str | list[str], mode: str = "auto"
) -> DataFrame:
    """S3 — PRIDE XML identifications → canonical psms frame.

    ``mode="whole"`` (default for small files): one streaming-iterparse
    task per file, same executor-side strategy and output schema as
    ``read_mzid_psms_whole``; memory is one-element-bounded but a single
    giant file parses serially.

    ``mode="split"`` (auto past ``xmlsplit.SPLIT_THRESHOLD_MB``):
    ``GelFreeIdentification`` / ``TwoDimensionalIdentification`` records
    are byte-range partitioned across executors (they are self-contained
    and never nest), document-order PSM ids are recovered with the
    two-pass distributed row index, and precursor mz/charge resolve via
    an equi-join against the range-parallel mzData spectra scan — one
    multi-GB legacy submission file parses at cluster parallelism.
    Both modes produce identical rows (asserted in
    tests/test_format_readers.py)."""
    if isinstance(paths, str):
        paths = [paths]
    if xmlsplit.pick_mode(paths, mode) == "split":
        return _read_pridexml_psms_split(spark, paths)
    return _read_pridexml_psms_whole(spark, paths)
