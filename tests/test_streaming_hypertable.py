"""Streaming continuous aggregate: stream → persisted hypertable store,
incremental across availableNow runs, idempotent on batch replay."""

from __future__ import annotations

import datetime
import os

import pytest

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


def test_sink_recovers_retired_partition_before_rebuild_probe(spark, tmp_path):
    """r10 review: a crash inside refresh's two-rename swap on a
    single-partition store leaves only .retired-part_date=d; the sink
    must restore it BEFORE the has_data probe — probing first read the
    store as empty and the rebuild branch's mode('overwrite') destroyed
    the retired history."""
    import shutil

    from pride_spark.operators.timeseries import build_hypertable_store

    store = str(tmp_path / "store")
    first = _events(spark, 0, 60)
    build_hypertable_store(first, "ts", AGGS, store, finest="hour")
    # simulate the crash window on EVERY partition: retired, replacement
    # missing — the pre-fix probe reads this as an empty store
    for leaf in [n for n in os.listdir(store) if n.startswith("part_date=")]:
        os.rename(os.path.join(store, leaf), os.path.join(store, ".retired-" + leaf))

    sink = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    second = _events(spark, 60, 60)
    sink(second, batch_id=0)

    served = read_hypertable(spark, store, AGGS, resolutions=("hour",))
    want = hypertable_rollup(
        first.unionByName(second), "ts", AGGS, resolutions=("hour",)
    )
    assert _canon(served) == _canon(want)  # history survived the crash


def test_refresh_merges_null_timestamp_partition(spark, tmp_path):
    """r10 review: NULL-ts events live in the __HIVE_DEFAULT_PARTITION__
    leaf; refresh must read, merge and swap that partition instead of
    silently dropping it (isin() never matches NULL; 'part_date=None'
    never matches the hive leaf name)."""
    from pride_spark.operators.timeseries import (
        build_hypertable_store,
        refresh_hypertable_store,
    )

    store = str(tmp_path / "store")
    base = _events(spark, 0, 40)
    null_rows = spark.createDataFrame(
        [(9000, None, 5.0), (9001, None, 7.0)],
        "event_id long, ts timestamp, value double",
    )
    build_hypertable_store(base.unionByName(null_rows), "ts", AGGS, store, finest="hour")

    more_nulls = spark.createDataFrame(
        [(9002, None, 11.0)], "event_id long, ts timestamp, value double"
    )
    refresh_hypertable_store(spark, store, more_nulls, "ts", AGGS, finest="hour")

    served = read_hypertable(spark, store, AGGS, resolutions=("hour",))
    want = hypertable_rollup(
        base.unionByName(null_rows).unionByName(more_nulls),
        "ts", AGGS, resolutions=("hour",),
    )
    assert _canon(served) == _canon(want)


def test_refresh_self_heals_missing_meta(spark, tmp_path):
    """r10 review: a store whose _meta sidecar was lost (crash between
    the first batch's parquet write and _write_store_meta) gets the
    caller's finest stamped on the next refresh, so grain validation
    works for the rest of the store's life instead of being silently
    disabled."""
    import shutil

    from pride_spark.operators.timeseries import (
        build_hypertable_store,
        refresh_hypertable_store,
    )

    store = str(tmp_path / "store")
    build_hypertable_store(_events(spark, 0, 40), "ts", AGGS, store, finest="hour")
    shutil.rmtree(os.path.join(store, "_meta"))

    refresh_hypertable_store(spark, store, _events(spark, 40, 10), "ts", AGGS, finest="hour")
    assert os.path.isdir(os.path.join(store, "_meta"))  # healed
    with pytest.raises(ValueError, match="finest"):
        refresh_hypertable_store(
            spark, store, _events(spark, 50, 10), "ts", AGGS, finest="day"
        )


def _two_date_events(spark, start_id, n_per_date, v):
    """n_per_date events on each of 2024-05-10 and 2024-05-11."""
    rows = []
    for d, day in enumerate((10, 11)):
        base = datetime.datetime(2024, 5, day, 6, 0, 0)
        rows += [
            (start_id + d * n_per_date + i,
             base + datetime.timedelta(minutes=13 * i), v)
            for i in range(n_per_date)
        ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, value double")


def test_crash_between_merge_and_marker_is_exactly_once(spark, tmp_path):
    """r11 verdict task #2, crash window (a): a kill AFTER the merge
    commits but BEFORE the marker replace previously double-counted that
    batch on replay.  The per-partition _merged_batch stamps (installed
    by the same atomic rename as each partition's data) now make the
    replay a no-op merge: it finds every touched partition stamped with
    the batch id, re-merges nothing, and writes the marker — EXACTLY
    once, with the store structurally clean and later batches merging
    normally."""
    from pride_spark.streaming import timeseries as st

    store = str(tmp_path / "store")
    sink = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    b0 = _two_date_events(spark, 0, 30, 1.0)
    b1 = _two_date_events(spark, 100, 30, 2.0)
    b2 = _two_date_events(spark, 200, 30, 3.0)
    sink(b0, 0)

    real_write_marker = st._write_marker
    def killed_marker(path, batch_id):
        raise RuntimeError("injected kill before marker replace")
    st._write_marker = killed_marker
    try:
        with pytest.raises(RuntimeError, match="injected kill"):
            sink(b1, 1)
    finally:
        st._write_marker = real_write_marker

    # the merge committed, the marker did not: replay (what Structured
    # Streaming does after the crash) finds the partition stamps and
    # skips the re-merge instead of double-counting
    assert st._read_marker(store) == 0
    sink(b1, 1)
    assert st._read_marker(store) == 1

    want = hypertable_rollup(
        b0.unionByName(b1), "ts", AGGS, resolutions=("hour",)
    )
    got = read_hypertable(spark, store, AGGS, resolutions=("hour",))
    assert _canon(got) == _canon(want)  # b1 applied EXACTLY once

    # no structural debris, and the next batch merges exactly once
    assert not [n for n in os.listdir(store)
                if n.startswith((".retired-", ".staging-"))]
    sink(b2, 2)
    want2 = hypertable_rollup(
        b0.unionByName(b1).unionByName(b2),
        "ts", AGGS, resolutions=("hour",),
    )
    assert _canon(read_hypertable(spark, store, AGGS, resolutions=("hour",))) \
        == _canon(want2)


def test_crash_mid_swap_multi_date_is_exactly_once(spark, tmp_path):
    """r11 verdict task #2, crash window (b): the swap is atomic per
    PARTITION, not across a multi-date batch — a kill between the two
    dates' swaps leaves the first date holding the batch's contribution
    (with its _merged_batch stamp) while recovery reverts the second to
    its pre-batch state.  The replay previously double-counted the batch
    into the already-swapped date; now the stamp makes it skip that date
    and merge ONLY the reverted one — the whole batch lands exactly
    once."""
    store = str(tmp_path / "store")
    sink = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    b0 = _two_date_events(spark, 0, 30, 1.0)
    b1 = _two_date_events(spark, 100, 30, 2.0)
    sink(b0, 0)

    state = {"staged": 0, "swapped_leaf": None}
    real_rename = os.rename

    def kill_on_second_swap(src, dst):
        if ".staging-" in src:
            state["staged"] += 1
            if state["staged"] == 2:
                raise RuntimeError("injected kill mid-swap")
            state["swapped_leaf"] = os.path.basename(dst)
        return real_rename(src, dst)

    os.rename = kill_on_second_swap
    try:
        with pytest.raises(RuntimeError, match="injected kill mid-swap"):
            sink(b1, 1)
    finally:
        os.rename = real_rename

    # post-crash state: one date swapped (holds b1 + its stamp), the
    # other retired
    swapped = state["swapped_leaf"]
    assert swapped is not None and swapped.startswith("part_date=")
    leaves = set(os.listdir(store))
    assert swapped in leaves
    assert os.path.exists(os.path.join(store, swapped, "_merged_batch"))
    retired = [n for n in leaves if n.startswith(".retired-part_date=")]
    assert len(retired) == 1
    unswapped = retired[0][len(".retired-"):]
    assert unswapped not in leaves  # live partition missing until recovery

    # replay after restart: recovery restores the un-swapped date FIRST,
    # then the re-merge skips the stamped date and applies b1 only to
    # the reverted one — no double count anywhere
    sink(b1, 1)
    assert not [n for n in os.listdir(store)
                if n.startswith((".retired-", ".staging-"))]

    want = hypertable_rollup(
        b0.unionByName(b1), "ts", AGGS, resolutions=("hour",),
    )
    got = read_hypertable(spark, store, AGGS, resolutions=("hour",))
    assert _canon(got) == _canon(want)  # exactly-once across both dates


def test_crash_during_first_batch_build_is_exactly_once(spark, tmp_path):
    """The initial store build routes through the same staged
    stamp-and-swap path as every refresh (r12): a kill between the first
    batch's two date swaps leaves a partial store, and the replay
    completes ONLY the missing date — previously the build branch's
    whole-store overwrite made this window a silent double-count or a
    history wipe depending on timing."""
    store = str(tmp_path / "store")
    sink = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    b0 = _two_date_events(spark, 0, 30, 1.0)

    state = {"staged": 0}
    real_rename = os.rename

    def kill_on_second_swap(src, dst):
        if ".staging-" in src:
            state["staged"] += 1
            if state["staged"] == 2:
                raise RuntimeError("injected kill mid-first-build")
        return real_rename(src, dst)

    os.rename = kill_on_second_swap
    try:
        with pytest.raises(RuntimeError, match="mid-first-build"):
            sink(b0, 0)
    finally:
        os.rename = real_rename

    # partial store: exactly one of the two dates is live, no marker yet
    live = [n for n in os.listdir(store) if n.startswith("part_date=")]
    assert len(live) == 1
    from pride_spark.streaming import timeseries as st
    assert st._read_marker(store) == -1

    sink(b0, 0)  # replay completes the missing date only
    want = hypertable_rollup(b0, "ts", AGGS, resolutions=("hour",))
    got = read_hypertable(spark, store, AGGS, resolutions=("hour",))
    assert _canon(got) == _canon(want)
    assert st._read_marker(store) == 0
    assert not [n for n in os.listdir(store)
                if n.startswith((".retired-", ".staging-"))]
