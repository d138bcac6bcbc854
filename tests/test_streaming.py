"""Batch-vs-stream equivalence (SURVEY.md §5.2) + streaming dedup behavior."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.tables import table
from tts_etl_pipeline_spark.streaming.events_stream import (
    deduped_stream,
    hourly_counts,
    run_to_memory,
    stream_events,
    user_sessions,
)


def test_stream_hourly_equals_batch(spark, sf_dir):
    got = run_to_memory(hourly_counts(stream_events(spark, sf_dir)), "t_hourly")
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0


def test_stream_dedup_drops_injected_duplicates(spark, sf_dir, tmp_path):
    # write events twice into one stream-source dir -> every event_id dupes
    ev = table(spark, sf_dir, "events").limit(200)
    src = str(tmp_path / "dupes")
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # watermark needs TZ type
    )
    got = run_to_memory(deduped_stream(stream), "t_dedup")
    assert got.count() == 200
    assert got.select("event_id").distinct().count() == 200


def test_stream_join_results_use_parquet_sink_not_driver_memory(spark, sf_dir):
    """st5/st12 emit FACT-SCALE rows (linear in the events): their
    streaming results must come back from the executor-written parquet
    file sink — never format('memory'), whose table is a LocalTableScan of
    rows materialized in DRIVER memory (round-6 verdict finding 2). The
    memory sink stays legitimate only for group-bounded aggregates."""
    from tts_etl_pipeline_spark.operators.streaming_queries import (
        st5_stream_stream_join,
        st12_stream_left_outer_complete,
    )

    for fn in (st5_stream_stream_join, st12_stream_left_outer_complete):
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LocalTableScan" not in plan, (fn.__name__, plan)
        assert "parquet" in plan.lower(), (fn.__name__, plan)
        assert df.count() > 0, fn.__name__


def test_run_to_parquet_zero_output_stream_serves_typed_empty(spark, sf_dir):
    """A stream whose filter matches nothing commits no data files: the
    read-back must still serve a correctly-typed EMPTY relation (explicit
    schema), not raise schema-inference errors."""
    from tts_etl_pipeline_spark.streaming.events_stream import (
        run_to_parquet,
        stream_events,
    )
    from pyspark.sql import functions as F

    ev = stream_events(spark, sf_dir).filter(
        F.col("event_type") == "no_such_type"
    ).select("event_id", "user_id", "ts")
    out = run_to_parquet(ev, "st_empty")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["event_id", "user_id", "ts"]


def test_stream_sessions_match_batch_sessionization(spark, sf_dir):
    from tts_etl_pipeline_spark.operators.events import e3_user_sessions

    sess = run_to_memory(user_sessions(stream_events(spark, sf_dir)), "t_sess")
    stream_counts = {
        r["user_id"]: r["n"]
        for r in sess.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    batch_counts = {
        r["user_id"]: r["n_sessions"] for r in e3_user_sessions(spark, sf_dir).collect()
    }
    assert stream_counts == batch_counts


def test_st14_streaming_kmv_exact_on_small_types(spark, tmp_path):
    """Under-filled sketches (< 32 distinct users per type) collapse to the
    exact distinct count — and the query's OWN double-run (a full
    at-least-once replay plus per-batch re-folds) must leave the sketch
    unchanged: 3 distinct clickers stay exactly 3.0 however often rows are
    re-offered."""
    from tts_etl_pipeline_spark.operators.streaming_queries import (
        st14_streaming_kmv_distinct,
    )

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    eid = 0
    for u in (1, 2, 3):
        for _ in range(4):
            rows.append((eid, "2024-01-01 10:00:00", u, "click", 1.0, "{}"))
            eid += 1
    for u in (7, 8):
        rows.append((eid, "2024-01-01 11:00:00", u, "purchase", 2.0, "{}"))
        eid += 1
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    # single FILE named events.parquet — the driver fixture layout the
    # readStream pathGlobFilter expects (a Spark .write.parquet directory
    # would hide the part files from the glob)
    pq.write_table(pa.Table.from_pandas(pdf), str(tmp_path / "events.parquet"))
    out = {
        r["event_type"]: (r["k_filled"], r["est_users"])
        for r in st14_streaming_kmv_distinct(spark, str(tmp_path)).collect()
    }
    assert out == {"click": (3, 3.0), "purchase": (2, 2.0)}


def test_st16_replay_commits_no_extra_versions(spark, sf_dir, tmp_path):
    """Exactly-once into the versioned table: a full fresh-checkpoint
    replay of the stream must add ZERO versions (every batch id probes as
    already-committed), and the final snapshot must equal the source."""
    from pyspark.sql import functions as F

    from tts_etl_pipeline_spark.sources.versioned import (
        current_version,
        read_version,
        write_version,
    )
    from tts_etl_pipeline_spark.streaming.events_stream import stream_events

    tbl = str(tmp_path / "tbl")

    def commit_batch(batch, bid):
        if current_version(tbl) > 0:
            if (
                read_version(spark, tbl)
                .filter(F.col("__batch_id") == bid)
                .limit(1)
                .count()
            ):
                return
        write_version(batch.withColumn("__batch_id", F.lit(bid)), tbl, "append")

    def run(ckpt):
        (
            stream_events(spark, sf_dir)
            .writeStream.foreachBatch(commit_batch)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    run("ckpt0")
    v_after_first = current_version(tbl)
    assert v_after_first >= 1
    run("ckpt1")  # full replay with a fresh checkpoint
    assert current_version(tbl) == v_after_first  # zero new versions
    got = read_version(spark, tbl).drop("__batch_id")
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got.count() == src.count()
    assert got.exceptAll(src.select(*got.columns)).isEmpty()


def test_st18_join_delays_downstream_watermark_by_interval(spark, tmp_path):
    """The emission contract st18's oracle encodes, pinned at minute grain:
    a purchase-hour window closes at maxts - 2h(watermark) - 1h(join
    interval), NOT at maxts - 2h. Dense synthetic pairs (click every 10
    minutes, purchase 5 minutes later, 24h span) make every hour a group,
    so an off-by-one-hour boundary shifts the emitted row count."""
    import datetime
    import uuid

    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    for m in range(0, 24 * 60, 10):
        rows.append((eid, 1, "click", base + datetime.timedelta(minutes=m)))
        eid += 1
        rows.append(
            (eid, 1, "purchase", base + datetime.timedelta(minutes=m + 5))
        )
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    src_dir = str(tmp_path / "ev")
    df.write.parquet(src_dir)
    src = spark.readStream.schema(df.schema).parquet(src_dir)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .select("user_id", F.col("ts").alias("click_ts"))
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user_id"), F.col("ts").alias("purchase_ts")
        )
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    hourly = joined.groupBy(F.window("purchase_ts", "1 hour").alias("win")).agg(
        F.count(F.lit(1)).alias("n")
    )
    name = f"st18_pin_{uuid.uuid4().hex[:8]}"
    q = (
        hourly.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["win"].start.hour: r["n"]
        for r in spark.table(name).collect()
    }
    # maxts = 23:55; boundary maxts - 3h = 20:55 -> hours 00..19 emit
    # (ends <= 20:00 <= 20:55), hours 20/21 are withheld even though a
    # -2h-only boundary (21:55) would have emitted hour 20.
    assert set(got) == set(range(20)), sorted(got)
    # each purchase matches the ~6 clicks in its trailing hour: 6 purchases
    # x 6 clicks = 36 pairs per steady-state hour (hour 0 ramps up)
    assert all(n == 36 for h, n in got.items() if h > 0), got


def test_append_window_emits_at_exact_watermark_equality(spark, tmp_path):
    """The st17/st18 oracles encode emission as window_end <= watermark.
    This pins the boundary CASE of that contract: with the max event time
    placed so the watermark lands EXACTLY on a window's end (maxts - 2h
    == 10:00:00.000000 == end of the 09:00 hour), Spark emits that
    window — eviction is <=, not strict <. If a Spark upgrade flipped
    this, both oracles would be off by one window on boundary-aligned
    data; this fails first."""
    import datetime
    import uuid

    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 3, 1)
    rows, eid = [], 0
    for h in range(10):
        for m in (5, 35):
            rows.append((eid, base + datetime.timedelta(hours=h, minutes=m)))
            eid += 1
    rows.append((eid, base + datetime.timedelta(hours=12)))  # wm -> 10:00:00
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    src_dir = str(tmp_path / "ev")
    df.write.parquet(src_dir)
    hourly = (
        spark.readStream.schema(df.schema)
        .parquet(src_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"wmedge_{uuid.uuid4().hex[:8]}"
    q = (
        hourly.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    hours = sorted(r["win"].start.hour for r in spark.table(name).collect())
    assert hours == list(range(10)), hours  # hour 9 (end == wm) included
