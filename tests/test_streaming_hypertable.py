"""Streaming continuous aggregate: stream → persisted hypertable store,
incremental across availableNow runs, idempotent on batch replay."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from pride_spark.operators.timeseries import AggSpec, hypertable_rollup, read_hypertable
from pride_spark.streaming.timeseries import (
    make_hypertable_batch_sink,
    stream_to_hypertable,
)

AGGS = [AggSpec("count", None, "n"), AggSpec("sum", "value", "value_sum")]


def _events(spark, start_id, n):
    base = datetime.datetime(2024, 5, 10, 6, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=23 * i), float(i % 7))
        for i in range(start_id, start_id + n)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, value double")


def _canon(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=repr
    )


def test_stream_to_hypertable_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    first, second = _events(spark, 0, 120), _events(spark, 120, 120)
    first.write.mode("append").parquet(src)

    stream = spark.readStream.schema(first.schema).parquet(src)
    q = stream_to_hypertable(
        stream, store, ckpt, "ts", AGGS, finest="hour", available_now=True
    )
    q.awaitTermination(120)

    served1 = read_hypertable(spark, store, AGGS, resolutions=("hour", "day"))
    want1 = hypertable_rollup(first, "ts", AGGS, resolutions=("hour", "day"))
    assert _canon(served1) == _canon(want1)

    # stage more events; the SAME checkpoint drains only the new file
    second.write.mode("append").parquet(src)
    q = stream_to_hypertable(
        spark.readStream.schema(first.schema).parquet(src),
        store, ckpt, "ts", AGGS, finest="hour", available_now=True,
    )
    q.awaitTermination(120)

    served2 = read_hypertable(spark, store, AGGS, resolutions=("hour", "day"))
    want2 = hypertable_rollup(
        first.unionByName(second), "ts", AGGS, resolutions=("hour", "day")
    )
    assert _canon(served2) == _canon(want2)


def test_batch_sink_replay_is_noop(spark, tmp_path):
    store = str(tmp_path / "store")
    sink = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    ev = _events(spark, 0, 50)

    sink(ev, 0)
    before = _canon(read_hypertable(spark, store, AGGS))
    # same batch id again (checkpoint replay after a crash): merged once
    sink(ev, 0)
    assert _canon(read_hypertable(spark, store, AGGS)) == before
    # a NEW batch id does merge
    sink(ev, 1)
    after = _canon(read_hypertable(spark, store, AGGS))
    assert after != before
    tot_n = [r for r in read_hypertable(spark, store, AGGS).collect() if r["level"] == "total"]
    assert tot_n[0]["n"] == 100

    assert os.path.exists(os.path.join(store, "_last_refresh_batch"))
