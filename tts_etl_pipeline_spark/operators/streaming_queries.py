"""Driver-facing streaming queries: each callable EXECUTES a Structured
Streaming job (availableNow over the static events parquet) and returns the
materialized result, so the t2 oracle checks genuine streaming output
against batch SQL (SURVEY.md §5.2 batch-vs-stream equivalence, promoted to
the driver gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.streaming.events_stream import (
    deduped_stream,
    hourly_counts,
    run_to_memory,
    stream_events,
    user_sessions,
)

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_register(
    "st1_stream_hourly_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY hour, event_type
    """,
)
def st1_stream_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = run_to_memory(hourly_counts(stream_events(spark, sf_dir)), "st1")
    return out.orderBy("hour", "event_type")


@_register(
    "st2_stream_dedup",
    """
    SELECT COUNT(*) AS n_rows, COUNT(DISTINCT event_id) AS n_ids
    FROM events
    """,
)
def st2_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on an already-unique key is the
    worst-case state test: output cardinality must equal input (events has
    unique event_ids; duplicate-injection is covered in tests/)."""
    deduped = run_to_memory(deduped_stream(stream_events(spark, sf_dir)), "st2")
    return deduped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
    )


@_register("st3_stream_sessions", None)  # session_window start/end are
# watermark-emission artifacts with no 1:1 SQL twin -> rows-only; the
# session-count equivalence vs the batch e3 query is asserted in tests/
def st3_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(user_sessions(stream_events(spark, sf_dir)), "st3").orderBy(
        "user_id", "session_start"
    )
