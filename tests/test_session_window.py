"""e11 native session windows: boundary semantics pin + e3 cross-parity.

The native gap rule is load-bearing for the oracle: Spark merges an event
into the open session when its timestamp is <= last_ts + gap (an EXACTLY
1800 s gap merges; a new session needs gap > 1800). If a Spark upgrade ever
flipped the boundary to half-open, the first test fails before the driver's
oracle comparison would.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_session_window_boundary_merges_exact_gap(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-01 10:30:00"),  # exactly 1800 s later -> merges
            (1, "2024-01-01 11:00:01"),  # 1801 s later -> new session
            (2, "2024-01-01 09:00:00"),
        ],
        "uid long, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = (
        df.groupBy("uid", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("uid", F.col("session_window.start").cast("string").alias("s"), "n")
        .orderBy("uid", "s")
        .collect()
    )
    assert [(r["uid"], r["n"]) for r in out] == [(1, 2), (1, 1), (2, 1)]


def test_e11_sessions_agree_with_e3_counts(spark, sf_dir):
    """Two independent sessionizations of the same events table — native
    session_window (e11) vs lag/cumsum islands (e3) — must yield the same
    per-user session count and total event count."""
    from tts_etl_pipeline_spark.operators.events import (
        e3_user_sessions,
        e11_native_session_window,
    )

    native = (
        e11_native_session_window(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )
    islands = e3_user_sessions(spark, sf_dir).select(
        "user_id", "n_sessions", "n_events"
    )
    assert native.exceptAll(islands).isEmpty()
    assert islands.exceptAll(native).isEmpty()


def test_e11_session_rows_are_consistent(spark, sf_dir):
    from tts_etl_pipeline_spark.operators.events import e11_native_session_window

    rows = e11_native_session_window(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["session_start"] <= r["last_ts"]  # ISO strings order correctly
        assert r["n_events"] >= 1


def test_e11_oracle_parity_subsecond_order_inversion(spark, tmp_path):
    """Adversarial ordering pin: two events share one truncated second at a
    session boundary, with event_id order OPPOSITE sub-second ts order. The
    oracle's flag and cumsum windows must sort identically (tss, event_id) —
    ordering the flag window by raw ts made the oracle split the sessions
    (2,1) where Spark's session_window on tss yields (1,2). Driver fixtures
    dodge this only because their event_ids happen to be monotone in ts."""
    import duckdb

    import __spark_entry__ as entry

    rows = [
        (1, "2024-01-01 09:00:00.000"),
        (10, "2024-01-01 10:00:00.900"),  # later ts, SMALLER truncated peer
        (11, "2024-01-01 10:00:00.100"),  # earlier ts, larger event_id
    ]
    df = spark.createDataFrame(
        [(eid, ts, 7, "click", 1.0, "{}") for eid, ts in rows],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    got = [
        tuple(str(v) for v in r)
        for r in entry.queries()["e11_native_session_window"](
            spark, str(tmp_path)
        ).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{tmp_path}/events.parquet/*.parquet')"
    )
    want = [
        tuple(str(v) for v in r)
        for r in con.execute(
            entry.oracle_sql()["e11_native_session_window"]
        ).fetchall()
    ]
    assert got == want
    assert [int(r[3]) for r in got] == [1, 2]  # 09:00 alone; both 10:00 rows


def test_u5_mapinarrow_counts_match_python(spark, tmp_path):
    """Unicode, empty and NULL text through the Arrow kernels vs a plain
    Python recount (codepoints vs utf-8 bytes diverge on non-ASCII)."""
    from tts_etl_pipeline_spark.operators.udfs import u5_mapinarrow_charclasses

    texts = {
        "en": ["hello world", "", None, "aeiou AEIOU"],
        "de": ["Grüße aus Köln", "äöü"],
        "zh": ["你好世界", "中文 aeiou"],
    }
    rows = [
        (i, t, lang)
        for i, (lang, ts) in enumerate(sorted(texts.items()))
        for t in ts
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["lang"]: (r["n_docs"], r["chars"], r["bytes"], r["vowels"])
        for r in u5_mapinarrow_charclasses(spark, str(tmp_path)).collect()
    }
    for lang, ts in texts.items():
        present = [t for t in ts if t is not None]
        expect = (
            len(ts),  # COUNT(*) counts NULL-text rows too
            sum(len(t) for t in present),
            sum(len(t.encode("utf-8")) for t in present),
            sum(sum(c in "aeiou" for c in t) for t in present),
        )
        assert out[lang] == expect, (lang, out[lang], expect)
