"""Cluster-consensus (A11–A13) and Occam's-razor inference tests."""

from __future__ import annotations

from pride_spark.operators.cluster import (
    best_psm_per_cluster,
    isobaric_pure_clusters,
    valid_peptidoforms,
)
from pride_spark.operators.inference import occams_razor


def _psms(spark):
    # cluster 1: pure (LEPTIDE/IEPTIDE isobaric-same), form A majority
    # cluster 2: impure (two distinct isobaric sequences) → dropped
    # cluster 3: pure but no majority peptidoform (2 vs 2) → dropped
    rows = [
        (1, "u1", "LEPTIDE", "A/2", 0.30),
        (1, "u2", "IEPTIDE", "A/2", 0.10),
        (1, "u3", "LEPTIDE", "A/2", 0.20),
        (1, "u4", "LEPTIDE", "B/2", 0.05),
        (2, "u5", "PEPK", "C/2", 0.10),
        (2, "u6", "QQQK", "C/2", 0.20),
        (3, "u7", "SSSK", "D/2", 0.10),
        (3, "u8", "SSSK", "E/2", 0.20),
        (3, "u9", "SSSK", "D/2", 0.30),
        (3, "u10", "SSSK", "E/2", 0.40),
    ]
    return spark.createDataFrame(
        rows, "clusterId int, usi string, peptideSequence string, peptidoform string, score double"
    )


def test_isobaric_purity(spark):
    pure = {r["clusterId"] for r in isobaric_pure_clusters(_psms(spark)).collect()}
    assert pure == {1, 3}


def test_valid_peptidoforms_majority(spark):
    valid = {
        (r["clusterId"], r["peptidoform"]): r["ratio"]
        for r in valid_peptidoforms(_psms(spark)).collect()
    }
    assert set(valid) == {(1, "A/2"), (2, "C/2")}
    assert valid[(1, "A/2")] == 0.75


def test_best_psm_per_cluster(spark):
    best = best_psm_per_cluster(_psms(spark)).collect()
    # only cluster 1 passes both gates; min score among A/2 members is u2
    assert len(best) == 1
    assert best[0]["clusterId"] == 1 and best[0]["usi"] == "u2"


def test_occams_razor_categories_and_cover(spark):
    # P1 & P2 identical peptide sets → indistinguishable group, leading
    # P3 strict subset of P1 → subset, absorbed
    # P4 distinct distinguishable protein, leading (covers pepX)
    rows = [
        ("pep1", ["P1", "P2"]),
        ("pep2", ["P1", "P2", "P3"]),
        ("pepX", ["P4"]),
    ]
    psms = spark.createDataFrame(rows, "peptideSequence string, proteinAccessions array<string>")
    out = {r["proteinAccession"]: r for r in occams_razor(psms).collect()}
    assert out["P1"]["category"] == "indistinguishable"
    assert out["P2"]["groupId"] == out["P1"]["groupId"] == "P1"
    assert out["P1"]["isLeading"] is True
    assert out["P3"]["category"] == "subset" and out["P3"]["isLeading"] is False
    assert out["P4"]["category"] == "distinguishable" and out["P4"]["isLeading"] is True
    # minimal cover: P1-group + P4 explain all peptides
    assert {a for a, r in out.items() if r["isLeading"]} == {"P1", "P2", "P4"}


def test_occams_razor_greedy_minimality(spark):
    # P5 covers {a,b,c}; P6 covers {a}; P7 covers {b} → greedy picks only P5
    rows = [
        ("a", ["P5", "P6"]),
        ("b", ["P5", "P7"]),
        ("c", ["P5"]),
    ]
    psms = spark.createDataFrame(rows, "peptideSequence string, proteinAccessions array<string>")
    out = {r["proteinAccession"]: r for r in occams_razor(psms).collect()}
    assert out["P5"]["isLeading"] is True
    assert out["P6"]["category"] == "subset" and not out["P6"]["isLeading"]
    assert out["P7"]["category"] == "subset" and not out["P7"]["isLeading"]

def test_occams_razor_past_ceiling_uses_distributed_path(spark):
    # past max_groups the call no longer raises: it auto-selects the
    # join-based formulation; results must be IDENTICAL to the driver path
    rows = (
        [("pep1", ["P1", "P2"]), ("pep2", ["P1", "P2", "P3"]), ("pepX", ["P4"])]
        + [("a", ["P5", "P6"]), ("b", ["P5", "P7"]), ("c", ["P5"])]
        + [(f"PEP{i}", [f"Q{i}"]) for i in range(20)]
    )
    psms = spark.createDataFrame(
        rows, "peptideSequence string, proteinAccessions array<string>"
    )

    def canon(df):
        return sorted(
            (r["proteinAccession"], r["groupId"], tuple(r["groupMembers"]),
             tuple(r["peptides"]), r["isLeading"], r["category"])
            for r in df.collect()
        )

    driver = canon(occams_razor(psms, max_groups=1000))
    dist = canon(occams_razor(psms, max_groups=2))  # forces distributed
    assert driver == dist
    cats = {a: c for a, _, _, _, _, c in dist}
    assert cats["P3"] == "subset" and cats["P1"] == "indistinguishable"
    assert cats["P6"] == "subset" and cats["Q0"] == "distinguishable"


def test_occams_razor_cover_ceiling_still_guards(spark):
    # the distributed path still refuses an unbounded COVER collect
    psms = spark.createDataFrame(
        [(f"PEP{i}", [f"P{i}"]) for i in range(10)],
        "peptideSequence string, proteinAccessions array<string>",
    )
    import pytest

    with pytest.raises(ValueError, match="greedy-cover collect ceiling"):
        occams_razor(psms, max_groups=2, max_cover_groups=3)
    assert occams_razor(psms, max_groups=100).count() == 10


def test_occams_razor_64x_duplicated_adversarial_corpus(spark):
    """VERDICT r5/r6 item: dual-path equivalence at adversarial scale —
    every PSM row duplicated 64x (stresses the collect_set dedup and the
    distributed absorption joins under heavy fan-in) on a corpus built
    to maximize the hard cases: a 64-member identical-peptide-set family
    (one 'indistinguishable' group of width 64), an 8-deep strict-subset
    chain, and a cover tie block where greedy gain updates matter."""
    import itertools

    base = []
    # 64 proteins sharing ONE identical peptide set -> single group, 64 members
    fam_peps = [f"fam_pep{i}" for i in range(5)]
    for p in fam_peps:
        base.append((p, [f"FAM{j}" for j in range(64)]))
    # 8-deep subset chain: CHAIN_k's set is a strict prefix of CHAIN_{k+1}'s
    for k in range(8):
        for i in range(k + 1):
            base.append((f"chain_pep{i}", [f"CHAIN{k}"]))
    # cover-tie block: two groups of equal size competing, overlap forces
    # a stale-gain refresh in the lazy-greedy heap
    base += [
        ("tie_a", ["TA"]), ("tie_b", ["TA"]), ("tie_c", ["TA"]),
        ("tie_b", ["TB"]), ("tie_c", ["TB"]), ("tie_d", ["TB"]),
        ("tie_e", ["TC"]), ("tie_d", ["TC"]),
    ]
    # singletons to pad group count
    base += [(f"solo_pep{i}", [f"SOLO{i}"]) for i in range(16)]

    rows = list(itertools.chain.from_iterable([r] * 64 for r in base))
    psms = spark.createDataFrame(
        rows, "peptideSequence string, proteinAccessions array<string>"
    )

    def canon(df):
        return sorted(
            (r["proteinAccession"], r["groupId"], tuple(r["groupMembers"]),
             tuple(r["peptides"]), r["isLeading"], r["category"])
            for r in df.collect()
        )

    driver = canon(occams_razor(psms, max_groups=1_000_000))
    dist = canon(occams_razor(psms, max_groups=0))  # force distributed
    assert driver == dist

    by_acc = {t[0]: t for t in driver}
    # the 64-member identical-set family is ONE indistinguishable group
    fam = by_acc["FAM0"]
    assert len(fam[2]) == 64 and fam[5] == "indistinguishable"
    assert all(by_acc[f"FAM{j}"][1] == fam[1] for j in range(64))
    # every chain link but the deepest is absorbed as a subset
    for k in range(7):
        assert by_acc[f"CHAIN{k}"][5] == "subset"
    assert by_acc["CHAIN7"][5] == "distinguishable" and by_acc["CHAIN7"][4]
    # solos are leading distinguishable singletons
    assert by_acc["SOLO0"][5] == "distinguishable" and by_acc["SOLO0"][4]


def test_occams_razor_consider_modifications_granularity(spark):
    """PIA considerModifications toggle (PIAModelerService.java:77,124)
    as occams_razor(peptide_col=...): at PLAIN-SEQUENCE granularity P1
    and P2 share the one peptide set {PEP K} and merge as
    indistinguishable; at PEPTIDOFORM granularity P1 carries only the
    unmodified form and P2 only the phosphorylated one, so they become
    distinct proteins — P1 a strict subset once a shared form exists."""
    rows = [
        # (sequence, peptidoform, proteins)
        ("PEPK", "PEPK/2", ["P1", "P2"]),
        ("PEPK", "PEP[UNIMOD:21]K/2", ["P2"]),
    ]
    psms = spark.createDataFrame(
        rows,
        "peptideSequence string, peptidoform string, proteinAccessions array<string>",
    )
    # considerModifications=false (merged-path default): one peptide
    # 'PEPK' -> identical sets -> indistinguishable group
    seq = {r["proteinAccession"]: r for r in occams_razor(psms).collect()}
    assert seq["P1"]["category"] == "indistinguishable"
    assert seq["P1"]["groupId"] == seq["P2"]["groupId"]

    # considerModifications=true: P1={PEPK/2}, P2={PEPK/2, PEP[phospho]K/2}
    # -> P1 is a strict SUBSET of P2; P2 leads alone
    form = {
        r["proteinAccession"]: r
        for r in occams_razor(psms, peptide_col="peptidoform").collect()
    }
    assert form["P1"]["category"] == "subset" and form["P1"]["isLeading"] is False
    assert form["P2"]["category"] == "distinguishable" and form["P2"]["isLeading"] is True
