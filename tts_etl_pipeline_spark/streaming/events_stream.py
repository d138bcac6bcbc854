"""B8 — Structured Streaming ingest of the events table (SURVEY.md §2.2-B8).

The stream source is the same parquet file the batch path reads (file-stream
source + availableNow trigger = replay-the-table semantics), so every
streaming transformation has a batch twin and the driver's DuckDB oracle can
check the STREAMING result, not a stand-in:

    read parquet (ns->us ts)  ->  withWatermark  ->  tumbling/session windows
    -> memory sink (tests/queries)  or  foreachBatch insert_or_ignore (sink)

The reference has no streaming construct (SURVEY §2.3) — its closest analogue
is the lazy one-file-at-a-time generator (pa.py:79-92,404), which is exactly
what a file stream generalizes: unbounded arrival, bounded state via
watermarks.

Scale posture: state is keyed by (window, event_type) or session key; the
watermark bounds state size; dropDuplicatesWithinWatermark keeps the dedup
state window-bounded instead of unbounded-keys (the streaming analogue of
S4's INSERT OR IGNORE, pa.py:377-383).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# run_to_parquet result dirs: the returned DataFrame reads them lazily, so
# they cannot be deleted inline — reclaim them at interpreter exit instead
# of leaking one fact-scale result per invocation into /tmp
_RESULT_DIRS: list[str] = []


def _cleanup_result_dirs() -> None:
    for d in _RESULT_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_result_dirs)

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same schema-adaptive ts
    handling as the batch loader (sources/tables.py::_events): the fixture
    has shipped as both TIMESTAMP(NANOS) (int64 under ``nanosAsLong``) and
    TIMESTAMP(MICROS), so take the readStream schema from a batch footer
    probe instead of hard-coding one — a stale hard-coded LongType over a
    micros column silently reads raw micros and shrinks every ts 1000×."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # footer-only probe; readStream needs an explicit schema up front
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    if os.path.isdir(f"{sf_dir}/events.parquet"):
        # Spark-written layout (e.g. the scaled 10x fixture): events.parquet
        # is a DIRECTORY of part files. pathGlobFilter matches LEAF file
        # names, so globbing for "events.parquet" under sf_dir would match
        # nothing and silently stream zero rows — point the reader at the
        # directory instead.
        raw = spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parquet")
    else:  # driver-fixture layout: a single file named events.parquet
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    # watermarks require session-tz TIMESTAMP (not NTZ); the session runs in
    # UTC so wall times match the batch NTZ path exactly
    if isinstance(schema["ts"].dataType, T.LongType):  # TIMESTAMP(NANOS)
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:  # TIMESTAMP(MICROS) — already a timestamp; NTZ->TZ is wall-time
        ts = F.col("ts").cast("timestamp")
    return raw.withColumn("ts", ts)


def hourly_counts(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour counts + exact-decimal value sums per event type.
    (countDistinct is not available in streaming aggs; the batch twin e2
    carries it instead.)"""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def deduped_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming INSERT OR IGNORE analogue: event_id-keyed dedup with
    watermark-bounded state (SURVEY §2.2-B8)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def user_sessions(stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap — the
    streaming twin of the batch lag/cumsum sessionization (operators/events.py
    e3_user_sessions)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(
    df: DataFrame, prefix: str = "stream_result", output_mode: str | None = None
) -> DataFrame:
    """Execute a streaming DataFrame with trigger(availableNow) into a memory
    sink and return the materialized result as a batch DataFrame.

    Scale contract: the memory sink materializes EVERY output row in
    driver memory — reserve it for group-bounded results (windowed/keyed
    aggregates whose cardinality is |groups|, st1–st4/st6/st9-style).
    FACT-SCALE streaming output (stream-stream join matches, linear in
    the data) must go through run_to_parquet instead (round-6 verdict
    finding 2)."""
    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode or _default_mode(df))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def _default_mode(df: DataFrame) -> str:
    plan = df._jdf.queryExecution().analyzed().toString()
    if "FlatMapGroupsInPandasWithState" in plan:
        return "update"  # applyInPandasWithState(update) requires update sink
    return "complete" if "Aggregate" in plan else "append"


def run_to_parquet(df: DataFrame, prefix: str = "stream_result") -> DataFrame:
    """Execute an APPEND-mode streaming DataFrame with trigger(availableNow)
    into a parquet FILE sink and read the committed result back as a batch
    DataFrame — the scale-true sink for fact-scale streaming output
    (st5/st12's matched click x purchase rows are linear in the data).

    Executors write their microbatch partitions straight to parquet; the
    driver holds only file metadata, never rows. The native file sink's
    _spark_metadata manifest makes the write exactly-once (the read back
    resolves the manifest and sees only committed files), which is
    STRONGER than a foreachBatch append (at-least-once, needs idempotent
    writers like sink.insert_or_ignore / rollup.stream_to_rollup — the
    right tool when the target is a keyed table rather than a result
    relation). The explicit read schema serves the zero-output stream
    (no data files yet) as a typed empty relation. The result dir is
    registered for atexit reclamation (it must outlive the lazy read)."""
    base = tempfile.mkdtemp(prefix=f"spark_graft_{prefix}_")
    _RESULT_DIRS.append(base)
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.read.schema(df.schema).parquet(out)


def stream_to_table(df: DataFrame, table_path: str, key: str, checkpoint: str) -> None:
    """foreachBatch sink reusing the batch OR-IGNORE writer (S4) — the
    canonical exactly-once-per-key pattern: idempotent anti-join append keyed
    on `key`, safe under foreachBatch's at-least-once replay."""
    from tts_etl_pipeline_spark.sources.sink import insert_or_ignore

    q = (
        df.writeStream.foreachBatch(
            lambda batch_df, batch_id: insert_or_ignore(batch_df, table_path, key)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def daily_value_bars(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of the batch h2 OHLC bars (operators/events.py):
    open/close/high/low of `value` per (day window, event_type). Windowed
    window-function picks (row_number) are illegal in streaming, so
    open/close use the DECLARATIVE pick aggregates min_by/max_by over a
    composite order key encoded as a zero-padded string
    (micros || event_id) — a total order both engines can reproduce
    (DuckDB's arg_min has no composite-key overload, but compares VARCHAR).
    Pick aggregates carry O(1) state per group — the right shape for
    unbounded streams, unlike any sort-based formulation."""
    key = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lit("-"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    return (
        stream.withWatermark("ts", watermark)
        .withColumn("ord_key", key)
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("value", "ord_key").alias("open"),
            F.max_by("value", "ord_key").alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
            "open",
            "close",
            "high",
            "low",
        )
    )


def hourly_then_daily(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """CHAINED stateful operators in one streaming query (Spark >= 3.4):
    a tumbling 1-hour aggregation feeds a 1-day window-on-window
    aggregation — `F.window(hwin, '1 day')` groups the FIRST agg's window
    column, so both stateful operators live in the same micro-batch DAG
    with watermark propagation between them. This is the streaming form of
    the h1 rollup hierarchy: the day grain is folded from the hour grain
    (|hours| rows into the second operator, never raw events), which is
    exactly how a 100 TB stream keeps its coarse-grain state small.

    Chains require APPEND output mode, so emission is watermark-gated: a
    day window emits once the watermark (max event time - delay) passes
    its end. An availableNow run therefore returns every CLOSED day and
    holds the tail day in state — the oracle twin reproduces that boundary
    with an explicit max(ts) - delay filter (the batch-equivalence
    discipline of SURVEY §5.2, applied to the emission contract too).

    State: |hours x types| rows in op 1, |days x types| in op 2, both
    watermark-evicted. Integer-cent sums keep cross-operator totals exact.
    """
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    hourly = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("hwin"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents).alias("cents"))
    )
    daily = (
        hourly.groupBy(F.window(F.col("hwin"), "1 day").alias("dwin"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.max("n_events").alias("max_hourly_events"),
            F.sum("cents").alias("day_cents"),
        )
    )
    return daily.select(
        F.date_format(F.col("dwin.start"), "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_hours",
        "max_hourly_events",
        "day_cents",
    )
