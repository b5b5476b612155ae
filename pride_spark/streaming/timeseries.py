"""Streaming continuous aggregate: event stream → persisted hypertable.

The batch operators in ``operators/timeseries.py`` define the store
(finest-level rollup, manifest-committed object dirs, internal decimal
representation) and its partition-pruned incremental merge; this module
drives that merge from Structured Streaming via ``foreachBatch`` — each
micro-batch refreshes only the date partitions it touches, so the
stream maintains an always-queryable multi-resolution rollup without
ever re-reading history.

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
2. The store's MANIFEST COMMIT (r13): a refresh stages every touched
   date into immutable object dirs and then atomically replaces the
   single manifest file that maps dates to live dirs, recording the
   installing ``batch_id`` per date.  The whole batch — however many
   dates — commits in ONE ``os.replace``: a crash before it leaves the
   store byte-identical to its pre-batch state (the replay simply
   redoes the batch), a crash after it leaves the batch fully
   committed (the replay finds every date carrying the batch id, skips
   the merge, and just writes the marker).  There is no partially-
   committed state for a replay to double-count, and concurrent
   readers resolving partitions through the manifest always see one
   complete generation — the per-partition crash windows of the old
   in-place-swap protocol no longer exist.

The initial store build goes through the same staged commit path, so a
crash during the FIRST batch recovers exactly-once too.  SCOPE: the
exactly-once guarantee covers PROCESS crashes/kills — that is what the
injection tests prove.  It does NOT extend to power loss: the manifest
bytes are fsync'd before the commit replace, but the object dirs'
parquet DATA files written by Spark are not, so after power loss a
committed manifest can point at torn data (r12 advice).  Closing that
needs data-file fsync (an fs/deployment concern).  A manifest
unreadable or corrupt despite the fsync ordering is refused loudly as
ambiguous rather than guessed around (``_read_manifest``).  Restarting
with a NEW checkpoint replays the source from scratch and would
double-count — rebuild the store alongside (an empty store clears any
stale marker so rebuilt batch ids starting at 0 are not skipped; stale
per-date batch ids die with the rebuilt manifest).

SINGLE WRITER: the store's refresh protocol (generation numbering +
GC-at-refresh-start) assumes one writer per store path.  Two streams —
or a stream plus a concurrent backfill — pointed at the same store
would interleave commits, clobber each other's marker, and revive the
double-count the protocol exists to prevent (r12 verdict watch item).
:class:`WriterLease` enforces it: the sink acquires a heartbeat lease
file at construction and a second writer with a DIFFERENT identity
fails loudly while the lease is fresh.  Writer identity is the
CHECKPOINT path for streams (a restart of the same checkpoint is the
same logical writer — Structured Streaming already serializes runs per
checkpoint) and a random token for plain batch-driver sinks.  The
lease is advisory fencing on a local/posix filesystem (pid + mtime
heartbeat, stale takeover), not a distributed lock service — on an
object store, front the store with a real lock or a transactional
table format.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Sequence

from pyspark.sql import DataFrame

from pride_spark.operators.timeseries import (
    AggSpec,
    _read_manifest,
    refresh_hypertable_store,
)

_MARKER = "_last_refresh_batch"
_LEASE = "_writer_lease"


def _read_marker(store_path: str) -> int:
    try:
        with open(os.path.join(store_path, _MARKER)) as fh:
            return int(fh.read().strip())
    except (OSError, ValueError):
        return -1


def _write_marker(store_path: str, batch_id: int) -> None:
    # tmp + os.replace so a crash mid-write never leaves a truncated
    # marker.  A crash BETWEEN the merge commit and this replace is
    # harmless: the replay finds every touched date carrying this batch
    # id in the manifest, re-merges nothing, and lands here again.
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


class WriterLease:
    """Single-writer lease for a hypertable store (r12 verdict task:
    nothing previously refused a second concurrent writer).

    A small JSON file inside the store records the holder's identity,
    pid, and acquisition time; its MTIME is the heartbeat, refreshed on
    every batch.  Acquisition fails loudly when a DIFFERENT identity
    holds a fresh lease; it succeeds when the lease is absent, stale
    (no heartbeat for ``stale_after`` seconds — a crashed writer), or
    held by the SAME identity (a restart of the same logical writer,
    e.g. the same streaming checkpoint).

    Fencing scope: best-effort on a shared posix filesystem.  Two
    writers racing a stale takeover within the same instant can both
    believe they won; :meth:`heartbeat` re-reads the file each batch
    and raises if the identity changed, so the loser stops at its next
    batch instead of silently interleaving commits forever.
    """

    def __init__(
        self, store_path: str, writer_id: str | None = None,
        *, stale_after: float = 600.0,
    ):
        self.store_path = store_path
        self.path = os.path.join(store_path, _LEASE)
        self.writer_id = writer_id or f"writer-{uuid.uuid4().hex}"
        self.stale_after = float(stale_after)
        self._acquire()

    def _read(self) -> tuple[dict | None, float]:
        try:
            with open(self.path) as fh:
                info = json.load(fh)
            return info, os.stat(self.path).st_mtime
        except (OSError, ValueError):
            return None, 0.0

    def _write(self) -> None:
        os.makedirs(self.store_path, exist_ok=True)
        tmp = f"{self.path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"writer_id": self.writer_id, "pid": os.getpid(),
                 "acquired_at": time.time()},
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.path)

    def _acquire(self) -> None:
        info, mtime = self._read()
        if info is not None and info.get("writer_id") != self.writer_id:
            age = time.time() - mtime
            if age < self.stale_after:
                raise RuntimeError(
                    f"hypertable store {self.store_path!r} already has a "
                    f"live writer (id={info.get('writer_id')!r}, "
                    f"pid={info.get('pid')}, heartbeat {age:.0f}s ago, "
                    f"stale_after={self.stale_after:.0f}s): the store's "
                    "merge protocol is single-writer — a second "
                    "concurrent stream or backfill would interleave "
                    "commits and double-count.  Stop the other writer, "
                    "or take over explicitly after it goes stale."
                )
        self._write()

    def heartbeat(self) -> None:
        """Refresh the heartbeat; raise if another writer took the
        lease (stale takeover won by someone else) — continuing to
        merge would interleave commits with theirs."""
        info, _ = self._read()
        if info is None or info.get("writer_id") != self.writer_id:
            raise RuntimeError(
                f"writer lease on {self.store_path!r} lost to "
                f"{(info or {}).get('writer_id')!r}: this writer was "
                "presumed crashed and superseded — refusing to merge "
                "over the new writer's commits"
            )
        os.utime(self.path, None)

    def release(self) -> None:
        """Drop the lease if still held (idempotent)."""
        info, _ = self._read()
        if info is not None and info.get("writer_id") == self.writer_id:
            try:
                os.remove(self.path)
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
    writer_id: str | None = None,
    lease_stale_after: float = 600.0,
):
    """The ``foreachBatch`` callable: merge each micro-batch into the
    store (building it on the first batch), EXACTLY-ONCE per
    ``batch_id`` (marker fast path + per-date batch ids inside the
    manifest commit — see module docstring).  Exposed separately so
    tests and backfill scripts can drive it with plain batch frames.

    Construction ACQUIRES the store's single-writer lease (module
    docstring): a second sink on the same store with a different
    ``writer_id`` raises while the first's heartbeat is fresh.  Pass
    the streaming checkpoint path as ``writer_id`` so a restarted
    stream reclaims its own lease (``stream_to_hypertable`` does);
    leave it None for a one-off backfill (random identity).  The lease
    is released with ``sink.release_lease()``; an unreleased lease
    simply goes stale after ``lease_stale_after`` seconds without a
    batch.

    The marker/lease files use the local/posix filesystem; on an
    object-store deployment swap them for the Hadoop FileSystem API or
    a lock service (same contract: small files inside the store).
    """
    by = list(by or [])
    lease = WriterLease(
        store_path, writer_id, stale_after=lease_stale_after
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        lease.heartbeat()  # fail fast if another writer superseded us
        man = _read_manifest(store_path)
        if man is None or not man.get("partitions"):
            # empty store + leftover marker = restart with a fresh
            # checkpoint: batch ids restart at 0, so a stale high marker
            # would silently skip every rebuilt batch.  Clear it.
            _clear_marker(store_path)
        elif batch_id <= _read_marker(store_path):
            return  # replayed batch under the same checkpoint: already merged
        # one path for first build and every later merge: refresh
        # handles the empty store (degenerates to the batch's own
        # rollup) and, given batch_id, records it against every
        # committed date inside the atomic manifest replace — the
        # replay-idempotence layer the marker alone can't provide
        refresh_hypertable_store(
            batch_df.sparkSession, store_path, batch_df, ts_col, aggs,
            finest=finest, by=by, bucket_col=bucket_col, batch_id=batch_id,
        )
        _write_marker(store_path, batch_id)

    _sink.lease = lease
    _sink.release_lease = lease.release
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

    The writer lease's identity is the CHECKPOINT path: a later run on
    the same checkpoint (the normal restart/incremental-drain pattern)
    is the same logical writer and reclaims the lease; a second stream
    on a DIFFERENT checkpoint is a genuine concurrent writer and is
    refused while the first's heartbeat is fresh.
    """
    sink = make_hypertable_batch_sink(
        store_path, ts_col, aggs, finest=finest, by=by,
        writer_id=f"checkpoint:{os.path.abspath(checkpoint)}",
    )
    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
