"""Bucketed co-located joins: the plan must contain NO shuffle exchange.

The physical-plan contract that matters at 100 TB: joining two tables
bucketed on the join key with the same bucket count reads matching
buckets pairwise — zero Exchange nodes on either side.
"""

from __future__ import annotations

import contextlib
import io

from pride_spark.sources.bucketing import read_table, write_bucketed


def test_bucketed_join_has_no_shuffle(spark):
    # managed tables land in the session's warehouse dir (static conf);
    # DROP TABLE in the finally removes their files
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    try:
        o = read_table(spark, "b_orders")
        l = read_table(spark, "b_lineitem")
        # hint away broadcast so the co-located merge path is what's planned
        joined = l.hint("merge").join(o, l.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan

        # and the join result is right (same as the shuffled plain-parquet join)
        expect = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .count()
        )
        assert joined.count() == expect > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
