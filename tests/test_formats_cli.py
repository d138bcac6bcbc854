"""Source-format round-trips (CSV/JSONL/partitioned parquet) and the CLI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tts_etl_pipeline_spark.sources import formats
from tts_etl_pipeline_spark.sources.tables import table


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    nation = table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    formats.write_csv(nation, path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = formats.read_csv(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").limit(50)
    path = str(tmp_path / "docs_jsonl")
    formats.write_jsonl(docs, path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = formats.read_jsonl(spark, path, schema).select(*[f.name for f in schema.fields])
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, docs.select(*[f.name for f in schema.fields]).collect())
    )


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    from tts_etl_pipeline_spark.plans.inspect import physical_plan

    docs = table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_by_lang")
    formats.write_partitioned_parquet(docs, path, ["lang"])
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    assert back.count() == docs.filter(F.col("lang") == "en").count()
    # partition pruning: the scan's PartitionFilters carry the lang predicate
    assert "lang" in physical_plan(back).split("PartitionFilters")[1][:120]


def test_cli_list_and_run(tmp_path):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "tts_etl_pipeline_spark", "list-queries"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0
    lines = out.stdout.strip().splitlines()
    assert any(line.startswith("q1_pricing_summary\toracle") for line in lines)
    assert len(lines) >= 60
    bad = subprocess.run(
        [sys.executable, "-m", "tts_etl_pipeline_spark", "run-query", "nope"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=240,
    )
    assert bad.returncode == 2 and "unknown query" in bad.stderr


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    cust = table(spark, sf_dir, "customer")
    path = str(tmp_path / "cust_orc")
    formats.write_orc(cust, path)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    back = formats.read_orc(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cust.collect()))


def test_overwrite_partitions_replaces_only_touched(spark, sf_dir, tmp_path):
    from tts_etl_pipeline_spark.sources.sink import overwrite_partitions

    path = str(tmp_path / "part_table")
    nation = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    overwrite_partitions(nation, path, ["n_regionkey"])
    before = spark.read.parquet(path)
    n_total = before.count()
    n_r0 = before.filter(F.col("n_regionkey") == 0).count()

    # rewrite ONLY region 0 with mutated names; other partitions must survive
    patched = (
        nation.filter(F.col("n_regionkey") == 0)
        .withColumn("n_name", F.lit("PATCHED"))
    )
    overwrite_partitions(patched, path, ["n_regionkey"])
    after = spark.read.parquet(path)
    assert after.count() == n_total
    assert after.filter(F.col("n_name") == "PATCHED").count() == n_r0
    assert after.filter((F.col("n_regionkey") != 0) & (F.col("n_name") == "PATCHED")).count() == 0
    # static overwrite mode restored
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"


def test_compact_parquet_shrinks_file_count(spark, sf_dir, tmp_path):
    from tts_etl_pipeline_spark.sources.sink import compact_parquet

    path = str(tmp_path / "fragmented")
    orders = table(spark, sf_dir, "orders")
    orders.repartition(16).write.parquet(path)  # simulate streaming small files
    n_before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_before >= 16
    rows = spark.read.parquet(path).count()
    checksum = spark.read.parquet(path).agg(F.sum("o_orderkey")).collect()[0][0]

    n_files = compact_parquet(spark, path, target_file_mb=512)
    assert n_files == 1  # sf0.001 orders is far below 512 MB
    assert sum(f.endswith(".parquet") for f in os.listdir(path)) == 1
    assert spark.read.parquet(path).count() == rows
    assert spark.read.parquet(path).agg(F.sum("o_orderkey")).collect()[0][0] == checksum
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")


def test_cli_explain(tmp_path):
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [sys.executable, "-m", "tts_etl_pipeline_spark", "explain",
         "q1_pricing_summary", "--sf-dir", "/root/testdata/sf0.001"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=240,
    )
    assert out.returncode == 0
    assert "Scan parquet" in out.stdout
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["scans_by_table"] == {"lineitem": 1}


def test_compact_parquet_crash_recovery(spark, sf_dir, tmp_path):
    """A crash between compact_parquet's two renames leaves the data parked
    at <table>._compact_old with the table path absent. recover_compaction
    (called automatically on the next compact) must roll it back with no
    data loss."""
    import os
    import shutil

    from tts_etl_pipeline_spark.sources.sink import (
        compact_parquet,
        recover_compaction,
    )
    from tts_etl_pipeline_spark.sources.tables import table

    path = str(tmp_path / "t")
    table(spark, sf_dir, "nation").write.parquet(path)
    expected = spark.read.parquet(path).count()

    # simulate the crash window: table renamed away, staged never renamed in
    os.rename(path, path + "._compact_old")
    assert not os.path.exists(path)

    assert recover_compaction(path) is True
    assert spark.read.parquet(path).count() == expected
    assert not os.path.exists(path + "._compact_old")

    # the same crash state is also healed by compact_parquet itself
    os.rename(path, path + "._compact_old")
    n_files = compact_parquet(spark, path, target_file_mb=512)
    assert n_files == 1
    assert spark.read.parquet(path).count() == expected
    assert recover_compaction(path) is False  # healthy table: no-op
    shutil.rmtree(path)
