"""Event-stream operators: windowed aggregation with late-data policy.

Batch/stream-agnostic: each function takes a DataFrame that may come from
``spark.read`` or ``spark.readStream`` and returns a transformed DataFrame;
the caller picks the sink (``write`` vs ``writeStream``).  Watermarks are
no-ops in batch mode, so the batch run of the same function is the oracle
for the streaming run (tested in ``tests/test_streaming.py``).

Scale notes: tumbling/sliding aggregation shuffles once on
``(window, event_type)``; state store size is bounded by the watermark
horizon; ``availableNow`` gives incremental backfill over historical
parquet without a separate batch codepath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

#: legacy events shape — ts as TIMESTAMP(NANOS), readable only as long.
#: Current driver testdata writes ts as TIMESTAMP(MICROS) (surfaces as
#: timestamp_ntz); ``read_event_stream`` probes the real file schema so
#: both generations read correctly.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

#: current events shape — ts as TIMESTAMP(MICROS) isAdjustedToUTC=false,
#: which Spark surfaces as TIMESTAMP_NTZ.  This is the empty-directory
#: fallback for ``read_event_stream``: a stream started before its producer
#: writes must assume the generation NEW files will have, and all current
#: producers write micros.  Legacy nanos-long directories are never empty
#: at stream start (they are historical archives), so they always take the
#: probe path.
EVENTS_SCHEMA_NTZ = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def with_event_time(df: DataFrame) -> DataFrame:
    """Canonicalize the event-time column ``ts`` to TIMESTAMP.

    Generation-independent output type:

    - legacy nanos-long generation → integer ``div`` to micros (no loss);
    - TIMESTAMP_NTZ (current micros generation, isAdjustedToUTC=false) →
      cast to TIMESTAMP.  ``withWatermark`` rejects NTZ event time
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); the session time zone is
      pinned to UTC (session.py RUNTIME_CONF) so the cast is
      epoch-preserving.

    A single output type also keeps streaming state-store schemas stable
    if a directory migrates generations across query restarts.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_event_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    """Incremental parquet source over an events directory.

    The stream schema is probed from the existing files (driver-side
    footer read, no scan): assuming nanos-long for a micros-timestamp
    file would silently shift every event to 1970.  If the directory is
    empty or not yet created (normal for a stream whose producer hasn't
    written), the probe fails and we fall back to ``EVENTS_SCHEMA_NTZ`` —
    the CURRENT generation (ts TIMESTAMP_NTZ/micros) — because files that
    arrive later on a fresh directory come from current producers; falling
    back to the legacy nanos-long schema would read their micros ts as
    bigint and shift every event ~1000x toward 1970.

    Assumes one ts generation per directory (the probe resolves a single
    footer type); mixed nanos-long + micros files in one directory must
    be read as two streams and unioned after :func:`with_event_time`.
    """
    from pyspark.errors import AnalysisException

    try:
        schema = spark.read.parquet(path).schema
    except AnalysisException as e:
        # Deliberately narrow: ONLY the empty/absent-directory classes
        # fall back (a fresh stream directory whose producer hasn't
        # written).  AnalysisException also covers illegal-parquet-type
        # errors — e.g. TIMESTAMP(NANOS) files probed on a session
        # without nanosAsLong — and swallowing those would run the
        # stream with the WRONG schema against real files (r10 review):
        # a corrupt footer or type error must surface here.
        cond = getattr(e, "getCondition", None) or getattr(e, "getErrorClass", None)
        klass = (cond() if cond else None) or str(e)
        if not any(t in klass for t in ("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND")):
            raise
        schema = EVENTS_SCHEMA_NTZ
    return with_event_time(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Per-(window, event_type) counts + value sums; late rows beyond the
    watermark are dropped in streaming mode (batch: watermark is a no-op)."""
    ev = events.withWatermark("ts", watermark) if streaming else events
    return (
        ev.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Overlapping (hopping) windows — each event lands in size/slide windows."""
    ev = events.withWatermark("ts", watermark) if streaming else events
    return (
        ev.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Per-user session windows (gap-based, variable length)."""
    ev = events.withWatermark("ts", watermark) if streaming else events
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n",
        )
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup with bounded state (watermark-scoped)."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str | None = None,
    *,
    max_rows: int = 1_000_000,
) -> list:
    """Drain the stream with the availableNow trigger into a memory sink;
    returns collected rows (test/demo helper — NOT a production sink: the
    memory format buffers the whole result on the driver by design;
    ``max_rows`` raises on oversized results instead of silently handing
    back an unbounded list, but the sink itself has already buffered the
    full result by then — results expected to be large belong in a file
    sink, not here).

    Default mode is ``complete`` (aggregations); stream-stream joins only
    support ``append`` — pass ``output_mode="append"`` for those.
    """
    if not stream_df.isStreaming:
        # writeStream.start() on a batch frame raises an opaque
        # AnalysisException anyway — fail with a usable message instead
        # of a conditional that implied batch support (r10 review)
        raise ValueError(
            "run_available_now drains STREAMING frames; for a batch frame "
            "just collect()/write() it directly"
        )
    if output_mode is None:
        output_mode = "complete"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = (
        stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"memory sink '{query_name}' exceeded max_rows={max_rows}; "
            "use a file sink for results this large"
        )
    return rows
