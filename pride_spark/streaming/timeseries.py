"""Streaming continuous aggregate: event stream → persisted hypertable.

The batch operators in ``operators/timeseries.py`` define the store
(finest-level rollup, date-partitioned, internal decimal representation)
and its partition-pruned incremental merge; this module drives that
merge from Structured Streaming via ``foreachBatch`` — each micro-batch
refreshes only the date partitions it touches, so the stream maintains
an always-queryable multi-resolution rollup without ever re-reading
history.

Why ``foreachBatch`` and not a stateful streaming aggregate: a windowed
streaming agg holds every open bucket in the state store and can only
EMIT finalized buckets past the watermark — the store-merge shape
instead keeps buckets queryable immediately (updated in place on every
batch) and handles arbitrarily late events for free (a stale date's
partition is simply touched again), with no state store at all.

Delivery guarantee: EXACTLY-ONCE per micro-batch under the same
checkpoint.  Structured Streaming replays a micro-batch after a crash
(at-least-once delivery into ``foreachBatch``); two layers make the
replayed merge idempotent:

1. A store-level marker file records the last fully-merged
   ``batch_id`` (tmp + ``os.replace`` so the marker itself is never
   torn); batches at or below it are skipped outright — the standard
   idempotent-foreachBatch recipe, and the fast path for clean replays.
2. Each swapped date partition carries a ``_merged_batch`` sidecar
   stamped with the installing batch id, written into the staged dir
   and installed by the SAME atomic rename as the partition's data
   (``refresh_hypertable_store(batch_id=...)``).  A replay that finds a
   partition already stamped with the current batch id skips it and
   merges only the partitions the crashed run missed.

Layer 2 closes the two crash windows layer 1 alone leaves open
(previously documented as at-least-once, now pinned exactly-once by
injection tests): (a) a failure after the merge commits but before the
marker replace — the replay finds every touched partition stamped,
re-merges nothing, and just writes the marker; (b) a failure MID-swap
in a multi-date batch — already-swapped dates are stamped and skipped,
recovery restores the un-swapped dates and the replay merges exactly
those.  The initial store build goes through the same staged
stamp-and-swap path, so a crash during the FIRST batch recovers
exactly-once too.  SCOPE: the exactly-once guarantee covers PROCESS
crashes/kills — that is what the injection tests prove.  It does NOT
extend to power loss: the batch-id stamp is fsync'd before the swap
rename (so a live partition implies a durable stamp on a journaled
fs), but the partition's parquet DATA files written by Spark are not
fsync'd — after power loss a live, durably-stamped partition can hold
torn data that the replay then rightly skips, an under-count the stamp
cannot detect (r12 advice).  Closing that needs data-file fsync (an
fs/deployment concern) or a transactional table format; a sidecar torn
despite the fsync ordering is refused loudly as ambiguous rather than
silently re-merged (``_partition_merged_batch``).  Restarting with a NEW checkpoint replays the
source from scratch and would double-count — rebuild the store
alongside (an empty store clears any stale marker so rebuilt batch ids
starting at 0 are not skipped; stale per-partition stamps die with the
rebuilt partitions themselves).
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame

from pride_spark.operators.timeseries import (
    AggSpec,
    _restore_retired_partitions,
    refresh_hypertable_store,
)

_MARKER = "_last_refresh_batch"


def _read_marker(store_path: str) -> int:
    try:
        with open(os.path.join(store_path, _MARKER)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return -1


def _write_marker(store_path: str, batch_id: int) -> None:
    # tmp + os.replace so a crash mid-write never leaves a truncated
    # marker.  A crash BETWEEN the merge commit and this replace is
    # harmless: the replay finds every touched partition stamped with
    # this batch id (the _merged_batch sidecars travel inside the
    # atomic partition swaps), re-merges nothing, and lands here again.
    os.makedirs(store_path, exist_ok=True)
    final = os.path.join(store_path, _MARKER)
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(batch_id))
    os.replace(tmp, final)


def _clear_marker(store_path: str) -> None:
    try:
        os.remove(os.path.join(store_path, _MARKER))
    except OSError:
        pass


def make_hypertable_batch_sink(
    store_path: str,
    ts_col: str,
    aggs: Sequence[AggSpec],
    *,
    finest: str = "hour",
    by: Sequence[str] | None = None,
    bucket_col: str = "bucket_start",
):
    """The ``foreachBatch`` callable: merge each micro-batch into the
    store (building it on the first batch), EXACTLY-ONCE per
    ``batch_id`` (marker fast path + per-partition batch stamps — see
    module docstring).  Exposed separately so tests and backfill
    scripts can drive it with plain batch frames.

    The marker file uses the local/posix filesystem; on an object-store
    deployment swap ``_read_marker``/``_write_marker`` for the Hadoop
    FileSystem API (same contract: one small file inside the store).
    """
    by = list(by or [])

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # crash recovery BEFORE the has_data probe (r10 review): a crash
        # inside refresh's two-rename swap on a single-partition store
        # leaves only .retired-part_date=d — probing first would read
        # that as "empty store" and clear the marker mid-stream.
        _restore_retired_partitions(store_path)
        has_data = os.path.isdir(store_path) and any(
            n.startswith("part_date=") for n in os.listdir(store_path)
        )
        if not has_data:
            # empty store + leftover marker = restart with a fresh
            # checkpoint: batch ids restart at 0, so a stale high marker
            # would silently skip every rebuilt batch.  Clear it.
            _clear_marker(store_path)
        elif batch_id <= _read_marker(store_path):
            return  # replayed batch under the same checkpoint: already merged
        # one path for first build and every later merge: refresh
        # handles the empty store (degenerates to the batch's own
        # rollup) and, given batch_id, stamps every swapped partition —
        # the replay-idempotence layer the marker alone can't provide
        refresh_hypertable_store(
            batch_df.sparkSession, store_path, batch_df, ts_col, aggs,
            finest=finest, by=by, bucket_col=bucket_col, batch_id=batch_id,
        )
        _write_marker(store_path, batch_id)

    return _sink


def stream_to_hypertable(
    stream_df: DataFrame,
    store_path: str,
    checkpoint: str,
    ts_col: str,
    aggs: Sequence[AggSpec],
    *,
    finest: str = "hour",
    by: Sequence[str] | None = None,
    available_now: bool = False,
):
    """Wire an event stream into the store; returns the started query.

    ``available_now=True`` drains everything currently in the source and
    stops — incremental backfill over historical parquet with the same
    sink the live stream uses.
    """
    sink = make_hypertable_batch_sink(
        store_path, ts_col, aggs, finest=finest, by=by
    )
    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
