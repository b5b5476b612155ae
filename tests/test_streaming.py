"""Structured Streaming surface: stream result == batch result (the
unified-API contract is the oracle), plus watermark late-data drop."""

from __future__ import annotations

import datetime
import shutil

import pytest
from pyspark.sql import functions as F

from pride_spark.streaming import events as ev


@pytest.fixture()
def events_dir(spark, tmp_path):
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(2000)
    path = str(tmp_path / "events_in")
    src.write.mode("overwrite").parquet(path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _rows_to_set(rows):
    return {tuple(r) for r in rows}


def test_tumbling_stream_equals_batch(spark, events_dir):
    batch = ev.tumbling_counts(
        ev.with_event_time(spark.read.parquet(events_dir)), streaming=False
    )
    stream = ev.tumbling_counts(ev.read_event_stream(spark, events_dir, max_files=2))
    got = ev.run_available_now(stream, "t_tumbling")
    assert _rows_to_set(got) == _rows_to_set(batch.collect())
    assert len(got) > 0


def test_sliding_stream_equals_batch(spark, events_dir):
    batch = ev.sliding_counts(
        ev.with_event_time(spark.read.parquet(events_dir)), streaming=False
    )
    stream = ev.sliding_counts(ev.read_event_stream(spark, events_dir, max_files=2))
    got = ev.run_available_now(stream, "t_sliding")
    assert _rows_to_set(got) == _rows_to_set(batch.collect())
    # every event appears in size/slide = 2 windows
    n_batch = sum(r["n"] for r in batch.collect())
    src_n = spark.read.parquet(events_dir).count()
    assert n_batch == 2 * src_n


def test_session_stream_equals_batch(spark, events_dir):
    batch = ev.session_counts(
        ev.with_event_time(spark.read.parquet(events_dir)), streaming=False
    )
    stream = ev.session_counts(ev.read_event_stream(spark, events_dir, max_files=2))
    got = ev.run_available_now(stream, "t_session")
    assert _rows_to_set(got) == _rows_to_set(batch.collect())
    assert len(got) > 0


def test_with_event_time_canonical_type(spark, events_dir):
    # NTZ (current testdata generation) and legacy nanos-long both land on
    # TIMESTAMP, and the epochs agree between the two conversions.
    ntz = spark.read.parquet(events_dir)
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"
    out_ntz = ev.with_event_time(ntz)
    assert dict(out_ntz.dtypes)["ts"] == "timestamp"

    legacy = ntz.withColumn(
        "ts", (F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
    )
    out_legacy = ev.with_event_time(legacy)
    assert dict(out_legacy.dtypes)["ts"] == "timestamp"
    a = out_ntz.select("event_id", "ts").orderBy("event_id").limit(100).collect()
    b = out_legacy.select("event_id", "ts").orderBy("event_id").limit(100).collect()
    assert a == b


def test_read_event_stream_empty_dir_falls_back(spark, tmp_path):
    # Empty source dir: schema probe fails ('unable to infer schema'), the
    # stream must still start (fallback EVENTS_SCHEMA_NTZ) and drain zero
    # rows.  (A *missing* dir is rejected by the file source itself.)
    path = tmp_path / "empty_events"
    path.mkdir()
    stream = ev.tumbling_counts(ev.read_event_stream(spark, str(path)))
    got = ev.run_available_now(stream, "t_empty")
    assert got == []


def test_read_event_stream_empty_dir_then_current_gen_file(spark, tmp_path):
    # The scenario the fallback exists for: stream starts on an empty dir,
    # then a CURRENT-generation (TIMESTAMP_NTZ micros) file arrives.  The
    # fallback schema must read its ts at the right epoch — a legacy
    # nanos-long fallback would misread micros as bigint and land every
    # window near 1970.
    src = tmp_path / "late_events"
    src.mkdir()
    stream_df = ev.tumbling_counts(ev.read_event_stream(spark, str(src)))
    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)
    rows = [(1, t0, 7, "click", 1.0, "{}"), (2, t0, 8, "view", 2.0, "{}")]
    spark.createDataFrame(rows, ev.EVENTS_SCHEMA_NTZ).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    got = ev.run_available_now(stream_df, "t_late_gen")
    assert len(got) == 2
    for r in got:
        assert r["window_start"].year == 2024, (
            "fallback schema misread the current-generation ts: "
            f"{r['window_start']}"
        )


def test_session_windows_gap_semantics(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 7),
        (2, t0 + datetime.timedelta(minutes=10), 7),   # same session (gap 30m)
        (3, t0 + datetime.timedelta(minutes=90), 7),   # new session
        (4, t0, 8),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = ev.session_counts(df, gap="30 minutes", streaming=False).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["n"])
    assert sorted(by_user[7]) == [1, 2]
    assert by_user[8] == [1]


def test_dedup_within_watermark_drops_replays(spark, tmp_path):
    t0_ns = 1_704_067_200 * 10**9  # 2024-01-01T00:00:00Z in nanos
    rows = [
        (1, t0_ns, 7, "click", 1.0, "{}"),
        (1, t0_ns, 7, "click", 1.0, "{}"),       # exact replay
        (2, t0_ns + 60 * 10**9, 7, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, ev.EVENTS_SCHEMA)
    path = str(tmp_path / "dedup_in")
    df.write.mode("overwrite").parquet(path)
    stream = ev.dedup_within_watermark(ev.read_event_stream(spark, path))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT event_id FROM t_dedup").collect()
    assert sorted(r["event_id"] for r in got) == [1, 2]


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    # exactly-once file-source semantics across a stop/restart: the second
    # run must process ONLY files that arrived after the first run, with
    # no duplicates and no gaps in the combined sink output
    src_dir = tmp_path / "src"
    sink_dir = str(tmp_path / "sink")
    ckpt_dir = str(tmp_path / "ckpt")
    src_dir.mkdir()
    all_events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(1000)
    first, second = all_events.filter("event_id % 2 = 0"), all_events.filter(
        "event_id % 2 = 1"
    )
    first.write.mode("overwrite").parquet(str(src_dir / "batch1"))

    def drain():
        stream = ev.read_event_stream(spark, str(src_dir / "*"), max_files=4)
        q = (
            stream.select("event_id", "ts", "event_type")
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n_first = spark.read.parquet(sink_dir).count()
    assert n_first == first.count()

    second.write.mode("overwrite").parquet(str(src_dir / "batch2"))
    drain()
    out = spark.read.parquet(sink_dir)
    assert out.count() == all_events.count()  # no gaps
    assert out.select("event_id").distinct().count() == all_events.count()  # no dupes


def test_dedup_within_watermark_ntz_generation(spark, events_dir):
    # Same operator over the current NTZ-micros testdata generation: the
    # stream must start (withWatermark needs the canonicalized TIMESTAMP)
    # and exact-dedup to the distinct event_id count.
    stream = ev.dedup_within_watermark(ev.read_event_stream(spark, events_dir, max_files=2))
    got = ev.run_available_now(stream, "t_dedup_ntz", output_mode="append")
    n_distinct = (
        spark.read.parquet(events_dir).select("event_id").distinct().count()
    )
    assert len(got) == n_distinct


def test_get_spark_tunes_borrowed_session(spark):
    """r10 review: getOrCreate returns pre-existing sessions with builder
    configs silently ignored — get_spark must re-apply the runtime
    defaults so a borrowed session's timezone/AQE matches the oracle."""
    from pride_spark.session import RUNTIME_CONF, get_spark

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    got = get_spark("borrowed")
    assert got is spark  # same session: the borrowed-session path
    assert got.conf.get("spark.sql.session.timeZone") == "UTC"
    for k, v in RUNTIME_CONF.items():
        assert got.conf.get(k) == v
    # STATIC_CONF lands at creation (conftest builds via get_spark):
    # the codegen-class cache must be big enough for a many-query
    # session — the r12 battery lever (session.py STATIC_CONF)
    from pride_spark.session import STATIC_CONF

    for k, v in STATIC_CONF.items():
        assert got.conf.get(k) == v


def test_read_event_stream_raises_on_non_empty_dir_errors(spark, tmp_path):
    """r10 review: only the empty/absent-dir probe failures fall back to
    the NTZ schema; a corrupt footer must surface, not silently run the
    stream with a guessed schema."""
    import pytest

    from pride_spark.streaming.events import read_event_stream

    empty = tmp_path / "empty"
    empty.mkdir()
    assert read_event_stream(spark, str(empty)).isStreaming
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0.parquet").write_bytes(b"not parquet at all")
    with pytest.raises(Exception, match="[Pp]arquet|footer|magic"):
        read_event_stream(spark, str(bad))
