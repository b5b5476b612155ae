"""Stream-stream time-range join and stream-static enrichment: the
streaming result must equal the batch result on the same finite input
(Structured Streaming's unified-API contract is the oracle)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pride_spark.streaming import events as ev
from pride_spark.streaming.joins import correlate_event_pairs, enrich_with_dimension


@pytest.fixture()
def events_dir(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(2000)
    path = str(tmp_path / "events_in")
    src.write.mode("overwrite").parquet(path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _rows_to_set(rows):
    return {tuple(r) for r in rows}


def test_stream_stream_join_equals_batch(spark, events_dir):
    batch_src = ev.with_event_time(spark.read.parquet(events_dir))
    batch = correlate_event_pairs(batch_src, batch_src, streaming=False)

    sa = ev.read_event_stream(spark, events_dir, max_files=2)
    sb = ev.read_event_stream(spark, events_dir, max_files=2)
    stream = correlate_event_pairs(sa, sb, streaming=True)
    got = ev.run_available_now(stream, "t_ss_join", output_mode="append")

    assert _rows_to_set(got) == _rows_to_set(batch.collect())
    assert len(got) > 0


def test_stream_stream_join_range_bound(spark, events_dir):
    src = ev.with_event_time(spark.read.parquet(events_dir))
    out = correlate_event_pairs(src, src, within="30 minutes", streaming=False)
    bad = out.filter((F.col("latency_us") < 0) | (F.col("latency_us") > 30 * 60 * 1_000_000))
    assert bad.count() == 0


def test_stream_static_enrichment(spark, events_dir):
    dim = spark.createDataFrame(
        [(i, f"seg{i % 3}") for i in range(50)], ["user_id", "segment"]
    )
    batch_src = ev.with_event_time(spark.read.parquet(events_dir))
    batch = enrich_with_dimension(batch_src, dim).select("event_id", "segment")

    stream = enrich_with_dimension(ev.read_event_stream(spark, events_dir, max_files=2), dim)
    got = ev.run_available_now(
        stream.select("event_id", "segment"), "t_enrich", output_mode="append"
    )
    assert _rows_to_set(got) == _rows_to_set(batch.collect())
    # left join: every event survives, matched or not
    assert len(got) == spark.read.parquet(events_dir).count()
