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


def test_sink_survives_aborted_attempt_debris(spark, tmp_path):
    """Manifest-era descendant of the r10 retired-partition recovery
    test: debris from an ABORTED refresh attempt (orphan object dirs
    renamed into .obj plus a leftover .staging dir, manifest never
    replaced) must neither read as an empty store (the marker would be
    cleared mid-stream) nor pollute the next merge — the committed
    history is untouched, the next batch merges on top of it, and the
    debris is swept."""
    from pride_spark.operators.timeseries import build_hypertable_store

    store = str(tmp_path / "store")
    first = _events(spark, 0, 60)
    build_hypertable_store(first, "ts", AGGS, store, finest="hour")
    # aborted-attempt debris: an unreferenced object dir and a staging
    # dir, both crash leftovers the manifest never pointed at
    os.makedirs(os.path.join(store, ".obj", "g999999-deadbeef-2024-05-10"))
    os.makedirs(os.path.join(store, ".staging-deadbeef"))

    sink = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    second = _events(spark, 60, 60)
    sink(second, batch_id=0)

    served = read_hypertable(spark, store, AGGS, resolutions=("hour",))
    want = hypertable_rollup(
        first.unionByName(second), "ts", AGGS, resolutions=("hour",)
    )
    assert _canon(served) == _canon(want)  # history survived the crash
    assert not [n for n in os.listdir(store) if n.startswith(".staging-")]
    assert "g999999-deadbeef-2024-05-10" not in os.listdir(
        os.path.join(store, ".obj")
    )


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


def test_crash_mid_commit_multi_date_is_atomic_and_exactly_once(spark, tmp_path):
    """r12 verdict task #1: under the manifest protocol a multi-date
    batch is ONE atomic commit.  A kill between the two dates' object-
    dir renames (the window that used to leave one date swapped and one
    retired) now leaves the manifest untouched — readers see the exact
    pre-batch state, with no partially-applied date at all — and the
    replay merges the whole batch exactly once."""
    from pride_spark.operators.timeseries import _read_manifest

    store = str(tmp_path / "store")
    sink = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    b0 = _two_date_events(spark, 0, 30, 1.0)
    b1 = _two_date_events(spark, 100, 30, 2.0)
    sink(b0, 0)
    man_before = _read_manifest(store)

    state = {"staged": 0}
    real_rename = os.rename

    def kill_on_second_obj_rename(src, dst):
        if ".staging-" in src:
            state["staged"] += 1
            if state["staged"] == 2:
                raise RuntimeError("injected kill mid-commit")
        return real_rename(src, dst)

    os.rename = kill_on_second_obj_rename
    try:
        with pytest.raises(RuntimeError, match="injected kill mid-commit"):
            sink(b1, 1)
    finally:
        os.rename = real_rename

    # post-crash state: the manifest is byte-identical to the pre-batch
    # commit — NO date holds any of b1 (the old protocol left one date
    # swapped here), so a concurrent reader cannot see a torn batch
    assert _read_manifest(store) == man_before
    want0 = hypertable_rollup(b0, "ts", AGGS, resolutions=("hour",))
    got0 = read_hypertable(spark, store, AGGS, resolutions=("hour",))
    assert _canon(got0) == _canon(want0)

    # the aborted attempt's orphan object dir(s): on disk, unreferenced
    before_live = {e["dir"] for e in man_before["partitions"].values()}
    aborted = set(os.listdir(os.path.join(store, ".obj"))) - before_live
    assert aborted  # the first date's rename landed before the kill

    # replay after restart: no date carries batch id 1, so the whole
    # batch re-merges — once.  The aborted attempt's orphans are swept
    # at the refresh start; the dirs THIS commit dereferences (b0's)
    # stay until the NEXT refresh begins — the reader grace window.
    sink(b1, 1)
    assert not [n for n in os.listdir(store) if n.startswith(".staging-")]
    man_after = _read_manifest(store)
    live = {e["dir"] for e in man_after["partitions"].values()}
    on_disk = set(os.listdir(os.path.join(store, ".obj")))
    assert live <= on_disk
    assert not (aborted & on_disk)

    want = hypertable_rollup(
        b0.unionByName(b1), "ts", AGGS, resolutions=("hour",),
    )
    got = read_hypertable(spark, store, AGGS, resolutions=("hour",))
    assert _canon(got) == _canon(want)  # exactly-once across both dates


def test_crash_during_first_batch_build_is_exactly_once(spark, tmp_path):
    """The initial store build routes through the same manifest-commit
    path as every refresh: a kill between the first batch's two object
    renames leaves NO committed store at all (the manifest was never
    written — readers cannot see a half-built store, where the old
    protocol exposed one live date), and the replay builds the whole
    batch exactly once."""
    from pride_spark.operators.timeseries import _read_manifest

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

    # nothing committed: no manifest, no marker — a reader sees "no
    # store yet", never a partial build
    assert _read_manifest(store) is None
    from pride_spark.streaming import timeseries as st
    assert st._read_marker(store) == -1
    with pytest.raises(ValueError, match="manifest"):
        read_hypertable(spark, store, AGGS, resolutions=("hour",))

    sink(b0, 0)  # replay rebuilds the whole first batch, once
    want = hypertable_rollup(b0, "ts", AGGS, resolutions=("hour",))
    got = read_hypertable(spark, store, AGGS, resolutions=("hour",))
    assert _canon(got) == _canon(want)
    assert st._read_marker(store) == 0
    assert not [n for n in os.listdir(store) if n.startswith(".staging-")]
    man = _read_manifest(store)
    live = {e["dir"] for e in man["partitions"].values()}
    assert live <= set(os.listdir(os.path.join(store, ".obj")))


def test_reader_polling_during_multi_date_commits_sees_only_whole_generations(
    spark, tmp_path
):
    """r12 verdict task #1 DONE criterion: a reader polling WHILE the
    writer commits multi-date batches must never observe a missing or
    mixed-generation partition set.  Each batch adds 30 events to each
    of two dates, so any consistent snapshot totals a multiple of 60 —
    a half-applied batch (one date new, one old) would total 30(k+j)
    with k != j, and a momentarily-missing partition would total 30k;
    both are detected.  Commits are slowed (sleep inside the object
    renames and before the manifest replace) so polls land inside the
    commit sequence."""
    import threading
    import time

    from pride_spark.operators import timeseries as ot

    store = str(tmp_path / "store")
    sink = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    n_batches = 4

    real_rename = os.rename
    real_write_manifest = ot._write_manifest

    def slow_rename(src, dst):
        if ".staging-" in src:
            time.sleep(0.25)
        return real_rename(src, dst)

    def slow_write_manifest(path, man):
        time.sleep(0.25)
        return real_write_manifest(path, man)

    observed, errors, stop = [], [], threading.Event()

    def poll():
        while not stop.is_set():
            try:
                rows = (
                    read_hypertable(spark, store, AGGS, resolutions=("hour",))
                    .filter("level = 'total'")
                    .collect()
                )
                observed.append(rows[0]["n"] if rows else 0)
            except ValueError:
                observed.append(None)  # no committed store yet: fine
            except Exception as e:  # a torn read IS the failure mode
                errors.append(repr(e))
                return

    reader = threading.Thread(target=poll)
    os.rename = slow_rename
    ot._write_manifest = slow_write_manifest
    try:
        reader.start()
        for b in range(n_batches):
            sink(_two_date_events(spark, 1000 * b, 30, float(b)), b)
            # grace-window contract: a reader must finish within one
            # refresh interval; give in-flight polls time to drain
            # before the next refresh's GC drops dereferenced dirs
            time.sleep(1.5)
    finally:
        stop.set()
        reader.join(timeout=60)
        os.rename = real_rename
        ot._write_manifest = real_write_manifest

    assert not errors, errors
    valid = {None} | {60 * (k + 1) for k in range(n_batches)}
    assert set(observed) <= valid, sorted(
        set(observed) - valid, key=repr
    )
    committed = [o for o in observed if o is not None]
    assert committed == sorted(committed)  # commits are ordered: monotone
    # the poller genuinely overlapped the run: it saw more than one state
    assert len(set(observed)) >= 2, observed


def test_writer_lease_single_writer_contract(spark, tmp_path):
    """r12 verdict task #3: a second concurrent writer on the same
    store fails loudly at construction; the SAME writer identity (a
    restarted stream on its checkpoint) reclaims; an explicit release
    or a stale heartbeat frees the store; a superseded writer's next
    batch refuses instead of interleaving commits."""
    import time

    from pride_spark.streaming.timeseries import WriterLease

    store = str(tmp_path / "store")
    sink1 = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    with pytest.raises(RuntimeError, match="single-writer"):
        make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")

    # same identity reclaims (stream restart on the same checkpoint)
    s_a = make_hypertable_batch_sink(
        store + "2", "ts", AGGS, writer_id="checkpoint:/x"
    )
    s_b = make_hypertable_batch_sink(
        store + "2", "ts", AGGS, writer_id="checkpoint:/x"
    )
    s_b.release_lease()

    # explicit release frees the store for a new writer
    sink1.release_lease()
    sink2 = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")

    # stale heartbeat: backdate the lease mtime past stale_after, then a
    # new writer takes over; the superseded writer's next batch refuses
    lease_path = os.path.join(store, "_writer_lease")
    old = time.time() - 10_000
    os.utime(lease_path, (old, old))
    sink3 = make_hypertable_batch_sink(store, "ts", AGGS, finest="hour")
    ev = _events(spark, 0, 10)
    sink3(ev, 0)  # new owner merges fine
    with pytest.raises(RuntimeError, match="lease"):
        sink2(ev, 1)  # superseded writer must NOT merge
    sink3.release_lease()

    # direct lease API: release is idempotent
    lease = WriterLease(store)
    lease.release()
    lease.release()
