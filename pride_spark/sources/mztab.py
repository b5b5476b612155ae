"""mzTab identification reader (SURVEY §2.1 S3) — pure Spark text ops.

The reference hands mzTab files to the PIA compiler
(``/root/reference/src/.../proteomics/PIAModelerService.java:162-189``).
mzTab is line-oriented: ``MTD`` metadata lines, one ``PSH`` header line
naming the PSM columns, and ``PSM`` data lines — so the whole parse is a
distributed text scan + split, no XML library and no Python row loop:

- ``MTD ms_run[i]-location`` lines give the spectra-file map;
- the ``PSH`` line (one per file, read on the driver) fixes column order;
- ``PSM`` lines project into the canonical psms frame.

``spectra_ref`` (``ms_run[1]:index=4`` / ``…:scan=97``) is split into
``msRun`` + raw ``sourceId``; id normalization (C9) is applied downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: mzTab PSM columns we project (name in PSH → output column)
_COLS = {
    "sequence": "peptideSequence",
    "PSM_ID": "psmId",
    "accession": "proteinAccession",
    "search_engine_score[1]_PSM": "score",
    "search_engine_score[1]": "score",
    "modifications": "modificationsRaw",
    "spectra_ref": "spectraRef",
    "retention_time": "retentionTime",
    "charge": "precursorCharge",
    "exp_mass_to_charge": "massToCharge",
    "opt_global_cv_MS:1002217_decoy_peptide": "isDecoyRaw",
}


def read_mztab_psms(spark: SparkSession, path: str) -> DataFrame:
    """One mzTab file → canonical psms DataFrame (distributed scan)."""
    lines = spark.read.text(path)
    header = (
        lines.filter(F.col("value").startswith("PSH\t")).limit(1).collect()
    )
    if not header:
        raise ValueError(f"no PSH header line in {path}")
    names = header[0]["value"].split("\t")[1:]
    psm = lines.filter(F.col("value").startswith("PSM\t")).select(
        F.split(F.col("value"), "\t").alias("f")
    )
    cols = []
    seen = set()
    for i, name in enumerate(names):
        out = _COLS.get(name)
        if out and out not in seen:
            seen.add(out)
            cols.append(F.col("f").getItem(i + 1).alias(out))
    df = psm.select(*cols)
    null = F.lit(None)
    if "retentionTime" in df.columns:
        df = df.withColumn(
            "retentionTime", F.nullif(F.col("retentionTime"), F.lit("null")).cast("double")
        )
    if "precursorCharge" in df.columns:
        df = df.withColumn("precursorCharge", F.col("precursorCharge").cast("int"))
    if "massToCharge" in df.columns:
        df = df.withColumn("massToCharge", F.col("massToCharge").cast("double"))
    if "score" in df.columns:
        df = df.withColumn("score", F.nullif(F.col("score"), F.lit("null")).cast("double"))
    if "isDecoyRaw" in df.columns:
        df = df.withColumn("isDecoy", F.col("isDecoyRaw") == "1").drop("isDecoyRaw")
    else:
        df = df.withColumn("isDecoy", null.cast("boolean"))
    if "spectraRef" in df.columns:
        df = (
            df.withColumn(
                "msRun", F.regexp_extract("spectraRef", r"ms_run\[(\d+)\]", 1).cast("int")
            )
            .withColumn("sourceId", F.regexp_extract("spectraRef", r"ms_run\[\d+\]:(.*)", 1))
            .drop("spectraRef")
        )
    return df


def read_mztab_ms_runs(spark: SparkSession, path: str) -> DataFrame:
    """``MTD ms_run[i]-location`` lines → (msRun, location)."""
    lines = spark.read.text(path)
    runs = lines.filter(F.col("value").rlike(r"^MTD\tms_run\[\d+\]-location\t"))
    return runs.select(
        F.regexp_extract("value", r"ms_run\[(\d+)\]", 1).cast("int").alias("msRun"),
        F.element_at(F.split("value", "\t"), 3).alias("location"),
    )
