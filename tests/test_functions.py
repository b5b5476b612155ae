"""Scalar function tests (SURVEY §2.10 C1–C20)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pride_spark.functions.mass import (
    MONOISOTOPIC_MASS,
    WATER_MONO,
    delta_mz,
    missed_cleavages,
    theoretical_mass,
)
from pride_spark.functions.proforma import encode_peptidoform
from pride_spark.functions.strings import (
    capitalize,
    clean_file_name,
    clean_usi_special_chars,
    file_name_no_extension,
    ftp_to_https,
    make_isobaric,
    remove_charge_state,
    unimod_label_repair,
)
from pride_spark.functions.usi import build_usi, spectra_usi


def one(spark, expr, **cols):
    schema = ", ".join(f"{k} string" for k in cols)
    return spark.createDataFrame([tuple(cols.values())], schema).select(expr.alias("v")).first()["v"]


def test_clean_usi_special_chars(spark):
    assert one(spark, clean_usi_special_chars(F.col("s")), s="a(b)c d_e=f&g") == "abcdefg"


def test_clean_file_name(spark):
    assert one(spark, clean_file_name(F.col("s")), s='  "run\\01".mgf ') == "run01.mgf"


def test_file_name_no_extension(spark):
    assert one(spark, file_name_no_extension(F.col("s")), s="/data/run01.mzML.gz") == "run01"
    assert one(spark, file_name_no_extension(F.col("s")), s="run02.MGF") == "run02"


def test_remove_charge_state(spark):
    assert one(spark, remove_charge_state(F.col("s")), s="PEPTIDE[UNIMOD:4]/2") == "PEPTIDE[UNIMOD:4]"
    assert one(spark, remove_charge_state(F.col("s")), s="PEPTIDE") == "PEPTIDE"


def test_make_isobaric(spark):
    assert one(spark, make_isobaric(F.col("s")), s="LEULIL") == "IEUIII"


def test_ftp_https_capitalize_unimod(spark):
    assert one(spark, ftp_to_https(F.col("s")), s="ftp://host/x") == "https://host/x"
    assert one(spark, capitalize(F.col("s")), s="hELLO wORLD") == "Hello world"
    assert one(spark, unimod_label_repair(F.col("s")), s="UNIMOD:21") == "UNIMOD"
    assert one(spark, unimod_label_repair(F.col("s")), s="MS:1001600") == "MS"


def test_usi_build_and_truncate(spark):
    df = spark.createDataFrame(
        [("PXD001", "run01", "17", "PEPT/2")], "proj string, f string, sc string, interp string"
    )
    usi = df.select(
        build_usi(F.col("proj"), F.col("f"), F.lit("scan"), F.col("sc"), F.col("interp")).alias("u")
    ).first()["u"]
    assert usi == "mzspec:PXD001:run01:scan:17:PEPT/2"
    assert (
        df.select(spectra_usi(F.lit(usi)).alias("s")).first()["s"]
        == "mzspec:PXD001:run01:scan:17"
    )


def test_missed_cleavages(spark):
    cases = {"PEPTIDEK": 0, "PEKPTRIDEK": 1, "KKKP": 2, "KRKR": 3, "KPKP": 0}
    for seq, want in cases.items():
        got = one(spark, missed_cleavages(F.col("s")).cast("string"), s=seq)
        assert int(got) == want, f"{seq}: want {want} got {got}"


def test_theoretical_mass_glycine(spark):
    # G + water, within micro-Dalton quantization
    got = float(one(spark, theoretical_mass(F.col("s")).cast("string"), s="G"))
    assert got == pytest.approx(MONOISOTOPIC_MASS["G"] + WATER_MONO, abs=1e-5)


def test_delta_mz_exact_match_is_zero(spark):
    # observed m/z computed from the same residue table → delta ~ 0
    seq = "PEPTIDE"
    mono = sum(MONOISOTOPIC_MASS[c] for c in seq) + WATER_MONO
    mz = (mono + 2 * 1.007276) / 2
    df = spark.createDataFrame([(seq, 2, mz)], "seq string, z int, mz double")
    got = df.select(delta_mz("mz", "z", "seq").alias("d")).first()["d"]
    assert got == pytest.approx(0.0, abs=1e-5)


def test_encode_peptidoform(spark):
    mods_schema = "array<struct<position:int,accession:string,name:string,mass:double>>"
    df = spark.createDataFrame(
        [("PEPTIDE", [(3, "UNIMOD:21", "Phospho", 79.966), (0, "UNIMOD:1", "Acetyl", 42.01)], 2)],
        f"seq string, mods {mods_schema}, z int",
    )
    got = df.select(encode_peptidoform("seq", "mods", "z").alias("p")).first()["p"]
    assert got == "[UNIMOD:1]-PEP[UNIMOD:21]TIDE/2"

    df2 = spark.createDataFrame(
        [("ACDK", [(5, "UNIMOD:2", "Amidated", -0.98)], None)],
        f"seq string, mods {mods_schema}, z int",
    )
    got2 = df2.select(encode_peptidoform("seq", "mods").alias("p")).first()["p"]
    assert got2 == "ACDK-[UNIMOD:2]"


# ---------------------------------------------------------------------------
# misc: C13 / C14 / C15 / X2 / X5
# ---------------------------------------------------------------------------

def test_retention_time_fallback(spark):
    import math

    from pride_spark.functions.misc import retention_time_fallback

    df = spark.createDataFrame(
        [
            (1, 55.2, [{"accession": "MS:1000016", "value": "99.0"}]),
            (2, None, [{"accession": "MS:1000016", "value": "61.5"}]),
            (3, None, [{"accession": "MS:1000894", "value": "7"}]),
            (4, None, None),
        ],
        "id int, rt double, cv array<struct<accession:string,value:string>>",
    )
    out = {
        r["id"]: r["o"]
        for r in df.select("id", retention_time_fallback("rt", "cv").alias("o")).collect()
    }
    assert out[1] == 55.2 and out[2] == 61.5
    assert math.isnan(out[3]) and math.isnan(out[4])


def test_sha1_and_token(spark):
    from pride_spark.functions.misc import random_token, sha1_checksum

    df = spark.range(2).select(
        sha1_checksum(F.lit("hello")).alias("h"), random_token().alias("t")
    )
    rows = df.collect()
    assert rows[0]["h"] == "aaf4c61ddcc5e8a2dabede0f3b482cd9aea9434d"
    assert len(rows[0]["t"]) == 40 and rows[0]["t"] != rows[1]["t"]


def test_peaks_to_arrays(spark):
    from pride_spark.functions.misc import peaks_to_arrays

    df = spark.createDataFrame(
        [({300.5: 30.0, 100.1: 10.0, 200.2: 20.0},)], "peaks map<double,double>"
    )
    m, i = peaks_to_arrays("peaks")
    r = df.select(m.alias("m"), i.alias("i")).first()
    assert r["m"] == [100.1, 200.2, 300.5]
    assert r["i"] == [10.0, 20.0, 30.0]


def test_split_list(spark):
    from pride_spark.functions.misc import split_list

    df = spark.createDataFrame([("a.mzid, b.mzid,,  c.mzid ",)], "s string")
    assert df.select(split_list("s").alias("o")).first()["o"] == [
        "a.mzid", "b.mzid", "c.mzid",
    ]
