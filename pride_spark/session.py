"""SparkSession factory with scale-oriented defaults.

The reference runs one JVM per assay with hand-tuned ehcache tiers
(``/root/reference/src/.../utility/AppCacheManager.java:38-61``); here the
equivalent knobs are AQE + shuffle sizing, which generalize from local[32]
to a 1000-executor cluster without code changes.
"""

from __future__ import annotations

import contextlib
import os
import threading

from pyspark.sql import SparkSession

#: Config applied to every session this package creates.  All of these are
#: also safe to set at runtime on a borrowed session (see :func:`tune`).
RUNTIME_CONF = {
    # AQE: runtime re-planning, partition coalescing, skew-join splitting —
    # the scale story for the big PSM↔spectrum join (SURVEY §2.4 J5).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Cluster-deployment note (measured, not speculative): on a real
    # cluster raise spark.sql.adaptive.coalescePartitions.initialPartitionNum
    # to several x the executor-core count so AQE sizes shuffles DOWN to
    # the data (it can merge small partitions but cannot split
    # under-partitioned ones outside skew joins).  We deliberately do NOT
    # set it here: at sf0.1 on local[32] both initialPartitionNum=4x and
    # parallelismFirst=false measured ~20% SLOWER end-to-end (per-stage
    # AQE re-planning + task overhead dominate small shuffles, and the
    # advisory-size target serializes the iterative operators).
    # Deterministic timestamp semantics matching the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas-UDF path (the slow-path escape hatch).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The synthetic events table carries TIMESTAMP(NANOS) parquet columns,
    # which Spark only reads as long; sources convert explicitly.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

#: Config that must be set at SESSION CREATION (read once by JVM-static
#: initializers — runtime sets are silently ignored, so these are NOT in
#: RUNTIME_CONF / tune()).
STATIC_CONF = {
    # The whole-stage-codegen compiled-class cache defaults to 100
    # entries; a many-query session (the bench battery, a query server,
    # run-pipeline's DAG) generates far more codegen units than that, so
    # every re-run re-compiles via Janino on the DRIVER — measured ~1s
    # per warm q48_spectral_cluster run lost to recompilation alone
    # (warm median 5.1 -> 4.1 s; the base-edges lazy-checkpoint toRdd
    # 2.1 -> 1.0-1.5 s; STRESS_r12 q48_codegen_cache_ab).
    # 5000 compiled classes cost tens of MB of driver memory — noise
    # against the driver heap, and a pure win at any scale since this is
    # driver-side cost that data size never amortizes.
    "spark.sql.codegen.cache.maxEntries": "5000",
}


def get_spark(
    app_name: str = "pride-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the package defaults applied.

    ``extra_conf`` lets callers layer deployment-specific settings on top
    of the package defaults (e.g. the bench harness disables the UI and
    shrinks listener retention for long many-query sessions).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in STATIC_CONF.items():
        builder = builder.config(k, v)
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate RETURNS A PRE-EXISTING SESSION with builder configs
    # silently ignored (r10 review): a borrowed session with a non-UTC
    # timezone would shift every TIMESTAMP_NTZ cast and every window
    # boundary against the DuckDB oracle.  All RUNTIME_CONF keys (and
    # typical extra_conf) are runtime-settable, so re-apply them on the
    # returned session — a no-op on a fresh session, the fix on a
    # borrowed one.
    tune(spark)
    for k, v in (extra_conf or {}).items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static conf (e.g. spark.ui.enabled) on a
            pass  # pre-existing session cannot change — keep going
    return spark


# ---------------------------------------------------------------------------
# Deterministic cleanup for operator-pinned intermediates.
#
# Several operators persist an intermediate that the RETURNED lazy plan
# still reads (near-dup verify scans its candidate pairs twice; spectral
# clustering's binned frame feeds both the edge subtree and the final
# singleton fill).  Spark's lazy model means the operator itself cannot
# unpersist — only the caller knows when its action has completed.  The
# ContextCleaner frees these on driver GC eventually, but a long-lived
# driver (query server, notebook) accumulates pins meanwhile (measured:
# 131s vs 26s on the same CC query at the tail of a stress sequence).
#
# ``pinned_scope`` makes the cleanup explicit and precise: operators
# register every deliberate persist; frames registered inside an active
# scope are unpersisted (non-blocking) at scope exit.  Registration is
# per-thread, so concurrent driver threads' scopes never free each
# other's state — the race that a global before/after persistent-RDD
# diff would have.  Outside any scope, behavior is unchanged
# (ContextCleaner / release_cached_state semantics).
# ---------------------------------------------------------------------------

_scopes = threading.local()
_track_scopes = threading.local()


@contextlib.contextmanager
def _scope_on(local: threading.local):
    """The shared scope mechanics behind :func:`tracking_scope` and
    :func:`pinned_scope` (previously two byte-identical copies — r10
    review): push a fresh handle list onto the thread-local stack, pop
    at exit, non-blocking unpersist of everything registered, exceptions
    swallowed (cleanup must never mask the block's own error)."""
    stack = getattr(local, "stack", None)
    if stack is None:
        stack = local.stack = []
    handles: list = []
    stack.append(handles)
    try:
        yield
    finally:
        stack.pop()
        for h in handles:
            try:
                h.unpersist(False)
            except Exception:
                pass


@contextlib.contextmanager
def tracking_scope():
    """Release EVERYTHING this package registers via :func:`track_cached`
    inside the block — persisted frames AND checkpoint handles — at exit.

    Stronger than :func:`pinned_scope`: checkpoint RDDs have truncated
    lineage, so a plan depending on one is NOT recomputable after the
    scope exits.  Use only when nothing returned from the block is
    executed again afterwards (e.g. results were written to files inside
    the block, and callers get a read-back frame).  Scopes nest; each
    frees only its own registrations."""
    with _scope_on(_track_scopes):
        yield

# Session-global registry of every deliberate pin (persisted DataFrames
# AND localCheckpoint RDD handles — the latter live OUTSIDE the SQL
# CacheManager, so ``spark.catalog.clearCache()`` cannot see them).
# :func:`release_cached_state` sweeps and clears it, which is what lets
# the sweep work from TRACKED HANDLES instead of the private
# ``_jsc.getPersistentRDDs`` session map (round-5 verdict item).
# Bounded: past the cap the oldest entries are dropped — their cleanup
# falls back to the ContextCleaner on driver GC, the pre-tracking
# behavior, so the cap can never leak more than before.
_tracked_lock = threading.Lock()
_tracked: list = []
_TRACK_CAP = 4096


def track_cached(handle):
    """Register any handle with ``unpersist`` (a persisted DataFrame, a
    checkpoint's java RDD) for the session-wide
    :func:`release_cached_state` sweep.  Returns ``handle``.

    If a :func:`tracking_scope` is active on this thread, the handle is
    additionally recorded there for release at scope exit."""
    if handle is None:
        return handle
    with _tracked_lock:
        _tracked.append(handle)
        if len(_tracked) > _TRACK_CAP:
            del _tracked[: len(_tracked) - _TRACK_CAP]
    stack = getattr(_track_scopes, "stack", None)
    if stack:
        stack[-1].append(handle)
    return handle


def checkpoint_handle(df):
    """Java handle of the persisted RDD backing a ``localCheckpoint``-ed
    DataFrame — the ``LogicalRDD`` plan node's ``rdd`` field.  Tracking
    the checkpoint DIRECTLY (instead of diffing the global
    persistent-RDD map before/after, which misattributes a concurrent
    thread's freshly persisted RDD) makes cleanup safe in multi-threaded
    drivers.  Returns None when the private plan accessor fails (version
    drift) — callers then skip tracking rather than guess."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return None
        return plan.rdd()
    except Exception:
        return None


def register_pinned(frame):
    """Record a deliberately persisted intermediate (DataFrame, or any
    handle with ``unpersist``) against the innermost active
    :func:`pinned_scope` on this thread.  Returns ``frame`` so call
    sites can wrap the ``persist()`` expression.  Every registration is
    ALSO tracked session-globally for :func:`release_cached_state`."""
    track_cached(frame)
    stack = getattr(_scopes, "stack", None)
    if stack:
        stack[-1].append(frame)
    return frame


@contextlib.contextmanager
def pinned_scope():
    """Unpersist every operator-pinned intermediate registered on this
    thread within the block, once the block exits::

        with pinned_scope():
            out = cluster_spectra(spectra)
            result = out.collect()   # action completes inside the scope
        # binned/pairs intermediates are now unpersisted

    Scopes nest; each frees only its own registrations.  Run the
    consuming ACTION inside the scope — the returned plan may read the
    pinned frames, and after exit they recompute from lineage."""
    with _scope_on(_scopes):
        yield


def release_cached_state(spark: SparkSession) -> None:
    """Drop every cached relation AND every persisted RDD in the session.

    Operators in this package pin small frames deliberately for the
    duration of a returned plan (CC pins its final round, the multi-method
    spectral clusterer pins its binned/signature frames); the
    ContextCleaner only frees them on a driver GC.  A long-lived session
    that runs MANY unrelated plans back-to-back (the bench harness, a
    notebook, a query server) should call this between plans — executor
    storage otherwise accumulates every prior plan's pins and evicts the
    current plan's working set (observed: 131s vs 26s on the same CC query
    at the tail of a stress sequence, BENCH r3/r4).

    Implementation: ``clearCache()`` drops every SQL-cached relation
    (all ``persist()``-ed DataFrames), then the session-global
    :func:`track_cached` registry is swept for the pins the CacheManager
    cannot see — localCheckpoint RDD handles (CC rounds, two-pass row
    numbering).  Every deliberate pin in this package registers itself,
    so no private ``_jsc.getPersistentRDDs`` session-map accessor is
    needed (it was version-fragile and raced concurrent driver threads).
    Double-unpersist of an already-freed handle is a harmless no-op.

    .. warning:: Call this only at a QUIESCENT point — no query in
       flight on ANY driver thread.  The sweep is attribution-safe (it
       frees only handles this package pinned) but not thread-safe
       against concurrent execution: unpersisting another thread's
       ``localCheckpoint`` RDD truncates its lineage unrecoverably and
       fails that thread's job.  bench.py / sf1_gate.py call it between
       queries (quiescent); a multi-threaded query server should
       instead scope pins per query with :func:`pinned_scope`.
    """
    try:
        spark.catalog.clearCache()
    except Exception:
        pass
    with _tracked_lock:
        items = _tracked[:]
        _tracked.clear()
    for h in items:
        try:
            h.unpersist(False)
        except Exception:
            pass


def tune(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable defaults to a session we did not create.

    The correctness driver hands us its own session; timestamp/AQE conf must
    still match the oracle's semantics.

    STATIC_CONF keys cannot be applied here (read once by JVM-static
    initializers; runtime sets are silently ignored), so a BORROWED
    session keeps whatever it was built with — e.g. the 100-entry
    codegen class cache, which silently regresses the many-query bench
    numbers with no code change (r12 verdict watch item).  We can't fix
    that after the fact, but we can refuse to be silent about it: read
    each static key back and warn loudly when the live value differs.
    """
    import warnings

    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # immutable conf on some builds — keep going
            pass
    for k, want in STATIC_CONF.items():
        try:
            live = spark.conf.get(k, None)
        except Exception:
            continue  # key unknown to this build: nothing to compare
        if live is not None and str(live) != str(want):
            warnings.warn(
                f"borrowed SparkSession has {k}={live!r} (package default "
                f"{want!r}); this key is fixed at session creation, so it "
                "cannot be corrected here. Expect driver-side Janino "
                "recompilation thrash in many-query sessions (the r12 "
                "codegen-cache finding: ~10% battery slowdown). Build the "
                "session via pride_spark.session.get_spark() to get the "
                "static defaults.",
                RuntimeWarning,
                stacklevel=2,
            )
    return spark
