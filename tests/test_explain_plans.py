"""Physical-plan contracts: the shapes that must survive a 100x scale-up.

Each test renders the formatted explain of a registry query at sf0.001
and asserts plan properties — predicate pushdown reaching the parquet
scan, broadcast joins where a side is dimension-sized, and the absence
of single-partition exchanges / nested-loop cartesians on scale paths.
Mostly planning-only; the two-pass queries (q03/q26) do run their
boundary-collect jobs at build time — inherent to that shape.
"""

from __future__ import annotations

import contextlib
import io

from pride_spark import registry

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = registry.queries()[name](spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_stack_pushes_predicates_to_scan(spark):
    plan = _plan(spark, "q02_filter_stack")
    scans = [b for b in plan.split("\n\n") if "Scan parquet" in b]
    assert scans, plan
    assert any("PushedFilters: [" in s and "PushedFilters: []" not in s for s in scans), plan


def test_star_join_broadcasts_dimensions(spark):
    plan = _plan(spark, "q06_star_join")
    assert "BroadcastHashJoin" in plan, plan


def _assert_two_pass_shape(plan: str) -> None:
    # 1. no global sort: a formatted Sort node prints "[keys], <global>, 0"
    #    — global=true is the single-task funnel the two-pass design avoids
    assert "], true, 0" not in plan, plan
    # 2. SinglePartition exchanges are only legitimate on the tiny
    #    per-partition-offsets side, which is always broadcast afterwards;
    #    every one of them must be matched by a BroadcastExchange
    assert plan.count("SinglePartition") <= plan.count("BroadcastExchange"), plan


def test_fdr_fact_side_never_globally_sorted(spark):
    _assert_two_pass_shape(_plan(spark, "q03_fdr_qvalue"))


def test_positional_join_fact_side_never_globally_sorted(spark):
    _assert_two_pass_shape(_plan(spark, "q26_positional_join"))


def test_lsh_ann_is_bucketed_not_cartesian(spark):
    plan = _plan(spark, "q49_lsh_ann")
    assert "CartesianProduct" not in plan, plan
    # the candidate join must be an equi-join on the bucket key
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_embedding_near_dup_avoids_nested_loop(spark):
    plan = _plan(spark, "q34_embedding_near_dup")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lsh_pair_emission_has_no_pair_dedup_shuffle(spark):
    # first-collision-wins emits each candidate pair exactly once, so the
    # plan must not contain the old pair-level distinct (an aggregate
    # keyed on the pair ids — one full shuffle of the candidate explosion)
    for q in ("q24_lsh_near_dup", "q48_spectral_cluster"):
        plan = _plan(spark, q)
        for agg in ("HashAggregate(keys=[id_a", "SortAggregate(key=[id_a",
                    "HashAggregate(keys=[key_a", "SortAggregate(key=[key_a"):
            assert agg not in plan, (q, agg)


def test_scan_prunes_columns_for_narrow_projection(spark):
    # token stats reads documents(doc_id, text) only — the scan schema
    # must not include the unused lang/source/n_chars columns
    plan = _plan(spark, "q14_token_stats")
    scans = [b for b in plan.split("\n\n") if "Scan parquet" in b]
    assert scans, plan
    assert not any("n_chars" in s for s in scans), plan


def test_protein_rollup_single_exchange(spark):
    # hash-partitioning by protein alone serves both the (protein,
    # peptide) dedup window and the final groupBy(protein): exactly one
    # exchange in the whole rollup
    import re

    plan = _plan(spark, "q28_protein_rollup")
    nodes = re.findall(r"\(\d+\) Exchange", plan)
    assert len(nodes) == 1, plan


def test_group_psm_sets_single_exchange(spark):
    # r9: the PSM-set grouping's best-member rank, provenance collects,
    # and all-decoy vote are windows over the SAME (spectrum, form,
    # charge) partitioning — Catalyst must plan ONE exchange for all of
    # them (plus the leaf scan side has none: in-memory frame)
    import contextlib
    import io
    import re

    from pride_spark.operators.fdr import group_psm_sets

    df = spark.createDataFrame(
        [("f1", "P1", "s1", "PEPK", [], 2, 1.0, False, "MS:A")],
        "fileName string, psmId string, sourceId string, peptideSequence string, "
        "modifications array<struct<position:int,accession:string,name:string>>, "
        "precursorCharge int, score double, isDecoy boolean, scoreAccession string",
    )
    out = group_psm_sets(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    nodes = re.findall(r"\(\d+\) Exchange", plan)
    assert len(nodes) == 1, plan
