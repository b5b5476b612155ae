"""Reference-layout export — the exact backup file names downstream
consumers of the reference read (SURVEY §2.2 K6/K7 composition).

Reference naming, all from ``utility/BackupUtil.java:49-79`` under the
per-project folder created at ``PrideAnalysisAssayService.java:187-214``
(``{out}/{project}/``):

- ``{project}_{assay}_ArchiveProteinEvidence.json``      (T3)
- ``{project}_{assay}_ArchiveSpectrum_Total.json``       (T1, all rows)
- ``{project}_{assay}_SummaryArchiveSpectrum.json``      (T2)
- ``{project}_{batch}_ArchiveSpectrum.json``             (T1 per source
  file; ``batch = usi.split(':')[2]``, the writer loop at
  ``InferenceService.java:190-200`` / batch prefix at
  ``BackupUtil.java:56-58``)

The engine's native outputs are Spark directory tables (part files with
an atomic committer) — the right shape at scale.  This module
materializes the LEGACY layout from those tables: a distributed
JSON-lines write into a scratch directory, then a driver-side streaming
concatenation of the committed part files into the reference's single
file names (the same merge Nextflow's ``collectFile`` performs for the
reference, ``submissions.nf``).  A single output file is inherently a
single-stream step, so this is an explicit compatibility exporter, not
the scale path; the concat never buffers more than ``COPY_CHUNK`` bytes.

Field-name/value parity of the JSON rows is the jsonlines writer's
contract (schemas T1–T3); this module adds only the file layout.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import urllib.parse
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pride_spark.sources.jsonlines import write_jsonlines

#: streaming-copy buffer; bounds driver memory regardless of file size
COPY_CHUNK = 1 << 20

_BATCH_KEY = "__batch"


def _spark_uri(local_path: str) -> str:
    """Qualify a driver-local/shared-mount path with the file:// scheme so
    the distributed write lands on the mount even when the session's
    default filesystem is remote (e.g. HDFS) — an unqualified path would
    resolve against fs.defaultFS and the driver-side concat would then
    find an empty local directory."""
    return "file://" + os.path.abspath(local_path)


def protein_evidence_file(out_dir: str, project: str, assay: str) -> str:
    """``BackupUtil.getProteinEvidenceFile`` (``BackupUtil.java:49-54``)."""
    return os.path.join(out_dir, project, f"{project}_{assay}_ArchiveProteinEvidence.json")


def archive_spectrum_total_file(out_dir: str, project: str, assay: str) -> str:
    """``BackupUtil.getArchiveSpectrumFile`` (``BackupUtil.java:60-65``)."""
    return os.path.join(out_dir, project, f"{project}_{assay}_ArchiveSpectrum_Total.json")


def psm_summary_file(out_dir: str, project: str, assay: str) -> str:
    """``BackupUtil.getPsmSummaryEvidenceFile`` (``BackupUtil.java:74-79``)."""
    return os.path.join(
        out_dir, project, f"{project}_{assay}_SummaryArchiveSpectrum.json"
    )


def archive_spectrum_batch_file(out_dir: str, project: str, batch: str) -> str:
    """``BackupUtil.getArchiveSpectrumFileBatch`` over the prefix built at
    ``BackupUtil.java:67-72`` (``{out}/{project}/{project}``)."""
    return os.path.join(out_dir, project, f"{project}_{batch}_ArchiveSpectrum.json")


def _list_parts(src_dir: str) -> list[str]:
    return sorted(
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.startswith("part-") and not f.endswith(".crc")
    )


def concat_parts(src_dir: str, dest_file: str, *, tree: bool = False) -> int:
    """K6 — concatenate a Spark text/JSON output directory's part files
    into one file, in part-file name order (deterministic: the committer
    numbers parts by partition id).  Returns bytes written.

    ``tree=True`` additionally walks one level of partition
    subdirectories (``key=value/part-*``) in sorted dir order — the
    shape a ``partitionBy`` write leaves — so a Total file can be
    assembled from a single partitioned write instead of writing the
    table twice (r10 review).

    The reference gets this step from Nextflow ``collectFile``; here it
    is a bounded streaming copy (``COPY_CHUNK`` buffer), never a read of
    the whole table into memory.
    """
    parts = _list_parts(src_dir)
    if tree:
        for entry in sorted(os.listdir(src_dir)):
            sub = os.path.join(src_dir, entry)
            if os.path.isdir(sub) and "=" in entry:
                parts.extend(_list_parts(sub))
    written = 0
    os.makedirs(os.path.dirname(dest_file), exist_ok=True)
    tmp = f"{dest_file}.tmp-{uuid.uuid4().hex[:8]}"
    try:
        with open(tmp, "wb") as dst:
            for p in parts:
                with open(p, "rb") as src:
                    while True:
                        chunk = src.read(COPY_CHUNK)
                        if not chunk:
                            break
                        dst.write(chunk)
                        written += len(chunk)
        os.replace(tmp, dest_file)  # K7: atomic publish, no torn file
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return written


def export_reference_layout(
    out_dir: str,
    project: str,
    assay: str,
    *,
    archive_spectra: DataFrame | None = None,
    summary_spectra: DataFrame | None = None,
    protein_evidence: DataFrame | None = None,
    batch_files: bool = True,
    usi_col: str = "usi",
    scratch_dir: str | None = None,
) -> dict[str, str]:
    """Materialize the reference's backup-file layout from engine tables.

    Each provided frame is written distributed (scratch directory, atomic
    committer), then concatenated to the reference's exact file name.
    ``batch_files=True`` additionally writes the per-source-file
    ``{project}_{batch}_ArchiveSpectrum.json`` files: ONE extra
    distributed write partitioned by ``split(usi, ':')[2]``
    (``InferenceService.java:190``), then one concat per batch — never a
    per-batch Spark job.

    ``scratch_dir``: where the distributed writes land before the concat.
    Defaults to a driver-local temp dir — correct in local mode, but on a
    multi-node cluster executors can't reach the driver's /tmp, so pass a
    path on storage shared by driver and executors (the concat streams
    the committed part files from the driver).

    Returns ``{logical name: file path}`` for everything written.
    """
    out: dict[str, str] = {}
    if scratch_dir is None:
        scratch = tempfile.mkdtemp(prefix="pride_layout_")
    else:
        if "://" in scratch_dir:
            # the concat step streams part files with POSIX io, so the
            # scratch must be a locally-mounted path, not an FS URI
            raise ValueError(
                "scratch_dir must be a locally-mounted filesystem path "
                f"(got URI {scratch_dir!r}); mount the shared storage and "
                "pass its mount point"
            )
        # unique subdir: never rmtree a caller-owned directory, and two
        # concurrent exports sharing a scratch root can't collide
        scratch = os.path.join(scratch_dir, f"pride_layout_{uuid.uuid4().hex[:12]}")
        os.makedirs(scratch)
    try:
        if protein_evidence is not None:
            d = os.path.join(scratch, "proteins")
            write_jsonlines(protein_evidence, _spark_uri(d))
            f = protein_evidence_file(out_dir, project, assay)
            concat_parts(d, f)
            out["protein_evidence"] = f
        if summary_spectra is not None:
            d = os.path.join(scratch, "summary")
            write_jsonlines(summary_spectra, _spark_uri(d))
            f = psm_summary_file(out_dir, project, assay)
            concat_parts(d, f)
            out["psm_summary"] = f
        if archive_spectra is not None:
            f = archive_spectrum_total_file(out_dir, project, assay)
            if not batch_files:
                d = os.path.join(scratch, "archive")
                write_jsonlines(archive_spectra, _spark_uri(d))
                concat_parts(d, f)
                out["archive_total"] = f
            else:
                # ONE distributed write serves BOTH outputs: the batch
                # files concat per partition dir, and the Total file
                # concats the whole partition tree (incl. the
                # no-source-file rows under __HIVE_DEFAULT_PARTITION__) —
                # previously the full peak-array table was written twice
                # (r10 review)
                bd = os.path.join(scratch, "batches")
                # F.get (not getItem): a usi with no source-file segment
                # yields NULL under ANSI instead of an array-index error
                batched = archive_spectra.withColumn(
                    _BATCH_KEY, F.get(F.split(F.col(usi_col), ":"), 2)
                )
                # partitionBy drops the derived key from the rows, so the
                # batch files carry exactly the T1 fields the total does
                write_jsonlines(batched, _spark_uri(bd), partition_by=_BATCH_KEY)
                concat_parts(bd, f, tree=True)
                out["archive_total"] = f
                for entry in sorted(os.listdir(bd)):
                    if not entry.startswith(f"{_BATCH_KEY}="):
                        continue
                    # Spark %XX-escapes partition values in dir names;
                    # the reference uses the raw file name in its own
                    batch = urllib.parse.unquote(entry.split("=", 1)[1])
                    if batch == "__HIVE_DEFAULT_PARTITION__":
                        # rows whose usi lacks a source-file segment have
                        # no reference batch (the reference would NPE);
                        # they stay in the Total file only
                        continue
                    f = archive_spectrum_batch_file(out_dir, project, batch)
                    concat_parts(os.path.join(bd, entry), f)
                    out[f"archive_batch:{batch}"] = f
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out
