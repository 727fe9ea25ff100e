"""Structured Streaming layer over the events stream.

The reference is batch-only (SURVEY.md §2.9 — Airflow cron plus
date-partitioned paths emulate micro-batching); this module is the
engine's streaming extension. Each streaming query is the semantic twin
of a batch catalog query (queries/events_q.py), checked against it in
tests/test_streaming.py — batch/stream parity is the correctness
contract, the same way the batch catalog is checked against DuckDB.

Watermarking: 1 hour by default — events later than that get dropped
from the aggregation, which is the late-data policy a daily-ingest
warehouse inherits implicitly from its scheduler; here it is explicit
and tunable. At production scale the source becomes Kafka with the same
transformations; file-source streaming is used for tests and backfill.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# streaming-source schema for events.parquet. The driver has shipped
# the ``ts`` column two ways across testdata generations (see
# sources.readers.read_testdata): TIMESTAMP(MICROS) — read natively as
# TIMESTAMP_NTZ — and TIMESTAMP(NANOS), which Spark's parquet reader
# only surfaces as INT64 under the legacy nanosAsLong escape hatch.
# A streaming source must declare its schema up front, so the right
# shape is chosen per-path by probing one parquet footer (pyarrow),
# exactly like the batch reader branches on the actual file schema.
def _events_raw_schema(ts_is_nanos: bool) -> T.StructType:
    ts_type: T.DataType = T.LongType() if ts_is_nanos else T.TimestampNTZType()
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


def _probe_ts_is_nanos(path: str) -> bool:
    """True iff the parquet file(s) at ``path`` carry ``ts`` as
    TIMESTAMP(NANOS). Footer-only read (no data pages); a probe failure
    falls back to the current micros generation rather than refusing to
    define the stream."""
    try:
        import pyarrow.dataset as pads

        field = pads.dataset(path, format="parquet").schema.field("ts")
        return getattr(field.type, "unit", None) == "ns"
    except Exception:
        return False


# kept for callers/tests that reference the module-level micros schema
_EVENTS_RAW = _events_raw_schema(ts_is_nanos=False)


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@contextlib.contextmanager
def nanos_as_long(spark: SparkSession):
    """Scope ``spark.sql.legacy.parquet.nanosAsLong=true`` (required to
    scan the testdata's nanosecond ``ts`` as long) around a bounded
    stream's define+run, restoring the prior session value afterwards so
    unrelated parquet reads in a long-lived session are unaffected.

    The conf is read at scan time (each micro-batch), so the scope must
    cover the stream's execution, not just its definition.
    """
    try:
        old = spark.conf.get(_NANOS_CONF)
    except Exception:
        old = None
    spark.conf.set(_NANOS_CONF, "true")
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, old)


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of the events table (one file = one batch).

    ``ts`` is normalized to TIMESTAMP: watermarks/event-time windows
    require the zoned type (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    otherwise). The cast interprets the naive value in the session
    timezone — run streaming sessions under UTC (the default here) for
    instants that equal the batch NTZ values.

    Both testdata generations are supported, keyed on the actual file
    schema (footer probe, mirroring the batch reader's branch):
    TIMESTAMP(MICROS) files read natively as NTZ; TIMESTAMP(NANOS)
    files read as INT64 under ``spark.sql.legacy.parquet.nanosAsLong``
    (set here for the session — the conf is consulted at every
    micro-batch scan, so a define-scoped toggle would be unsafe) and
    truncated to microseconds, the same narrowing the batch reader and
    DuckDB apply.

    SESSION MUTATION WARNING: when the probe finds nanos files, the
    nanosAsLong conf stays set for the SESSION LIFETIME (it must cover
    every future micro-batch of the returned stream, whose stop time
    this function cannot know). While set, unrelated *batch* reads of
    nanos-timestamp parquet in the same session surface INT64 instead
    of raising. Long-lived mixed batch/stream sessions that need the
    strict behavior back should wrap bounded streams in the
    :func:`nanos_as_long` scope instead, or restore the conf explicitly
    once the stream stops (``spark.conf.unset`` of ``_NANOS_CONF``)."""
    ts_is_nanos = _probe_ts_is_nanos(path)
    if ts_is_nanos:
        spark.conf.set(_NANOS_CONF, "true")
    raw = (
        spark.readStream.schema(_events_raw_schema(ts_is_nanos))
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    if ts_is_nanos:
        ts = F.expr("convert_timezone('UTC', timestamp_micros(ts div 1000))")
    else:
        ts = F.col("ts")
    return raw.withColumn("ts", ts.cast("timestamp"))


def hourly_tumbling_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of queries.events_q.events_hourly_tumbling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Streaming gap-sessionization via native session_window — the
    stateful twin of operators.windows.sessionize (lag+cumsum batch
    form). Same session definition: events chain while consecutive gaps
    are <= the gap threshold."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def clicks_purchases_interval_join(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INTERVAL self-join: each click paired with every
    purchase by the same user in the preceding ``lookback`` window
    (attribution joins — the canonical stream-stream use case).

    State-bounding is the point: both sides carry a watermark and the
    join condition time-bounds purchase_ts relative to click_ts, so
    Spark can evict buffered rows older than watermark+lookback instead
    of buffering both streams forever. Batch twin:
    queries.events_q.events_interval_join (oracle-checked); parity in
    tests/test_streaming.py."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.expr(f"click_ts - interval {lookback}"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
    )
    return clicks.join(purchases, cond, "inner").select(
        "click_event_id", "user_id", "click_ts", "purchase_event_id", "purchase_ts"
    )


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Drive a (bounded file-source) streaming query to completion into
    an in-memory table; returns the result as a batch DataFrame.
    Complete output mode: fine for tests, not for unbounded state.
    Stateful operators (applyInPandasWithState) require ``update``."""
    q = df.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.table(name)
