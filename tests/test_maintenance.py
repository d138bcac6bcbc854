"""Policy-driven maintenance (sources/maintenance.py, driver query j40):
each trigger in isolation, content preservation, the vacuum marker's
idempotence, and the debt metrics themselves."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.maintenance import (
    auto_maintain,
    table_debt,
)
from tts_etl_pipeline_spark.sources.versioned import (
    delete_where_dv,
    delete_where_eq,
    manifest,
    read_version,
    write_version,
)


def _mk(spark, base, parts=4):
    path = f"{base}/t"
    df = spark.range(1, 501).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    write_version(
        df.repartitionByRange(parts, "k"), path, collect_stats=("k",)
    )
    return path, df


def _rows(spark, path):
    return sorted(map(tuple, read_version(spark, path).collect()))


def test_no_debt_means_no_actions(spark):
    base = tempfile.mkdtemp(prefix="mnt_")
    try:
        path, _ = _mk(spark, base)
        assert auto_maintain(spark, path) == []
        d = table_debt(path)
        assert d["n_files"] == 4 and d["n_eq_deletes"] == 0
        assert d["dv_dead_rows"] == 0 and d["n_rows"] == 500
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_trigger_only(spark):
    base = tempfile.mkdtemp(prefix="mnt_")
    try:
        path, df = _mk(spark, base)
        for i in range(10):
            write_version(
                df.limit(3).withColumn("k", F.col("k") + 1000 + i * 10),
                path, mode="append", collect_stats=("k",),
            )
        before = _rows(spark, path)
        acts = auto_maintain(
            spark, path,
            {"max_files": 8, "target_files": 4, "max_versions": 10**9},
        )
        assert [a["action"] for a in acts] == ["compact"]
        assert table_debt(path)["n_files"] <= 8
        assert _rows(spark, path) == before
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_dv_and_eq_triggers(spark):
    base = tempfile.mkdtemp(prefix="mnt_")
    try:
        path, df = _mk(spark, base)
        delete_where_dv(spark, path, "k", 1, 50)
        d = table_debt(path)
        assert d["dv_dead_rows"] == 50 and d["dv_ratio"] == pytest.approx(0.1)
        acts = auto_maintain(
            spark, path, {"max_dv_ratio": 0.05, "max_versions": 10**9}
        )
        assert [a["action"] for a in acts] == ["purge_dvs"]
        assert table_debt(path)["dv_dead_rows"] == 0
        before = _rows(spark, path)
        delete_where_eq(path, "k", [60])
        delete_where_eq(path, "k", [61])
        acts = auto_maintain(
            spark, path, {"max_eq_deletes": 1, "max_versions": 10**9}
        )
        assert [a["action"] for a in acts] == ["purge_eq"]
        assert table_debt(path)["n_eq_deletes"] == 0
        assert _rows(spark, path) == [
            r for r in before if r[0] not in (60, 61)
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_vacuum_trigger_uses_marker_not_head(spark):
    base = tempfile.mkdtemp(prefix="mnt_")
    try:
        path, df = _mk(spark, base)
        for i in range(6):
            write_version(
                df.limit(2).withColumn("k", F.col("k") + 2000 + i),
                path, mode="append",
            )
        pol = {
            "max_versions": 5, "keep_versions": 1, "grace_seconds": 0,
            "max_files": 10**6,
        }
        acts = auto_maintain(spark, path, pol)
        assert [a["action"] for a in acts] == ["vacuum"]
        # the marker, not the (still-growing) head number, drives it
        assert auto_maintain(spark, path, pol) == []
        write_version(df.limit(1), path, mode="append")
        assert auto_maintain(spark, path, pol) == []  # 1 < max_versions
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_debt_on_missing_table_refuses(spark):
    with pytest.raises(ValueError, match="no versions"):
        table_debt("/tmp/definitely_missing_table_xyz")


def test_debt_folds_sharded_summaries_without_materializing(spark):
    import json

    import tts_etl_pipeline_spark.sources.versioned as V

    base = tempfile.mkdtemp(prefix="mnt_")
    old = V._SHARD_INLINE_MAX
    V._SHARD_INLINE_MAX = 4  # force the sharded layout at tiny counts
    try:
        path = f"{base}/t"
        df = spark.range(1, 1001).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        )
        write_version(
            df.repartitionByRange(8, "k"), path, collect_stats=("k",)
        )
        assert "shards" in json.load(open(V._manifest_path(path, 1)))
        delete_where_dv(spark, path, "k", 1, 30)
        d = table_debt(path)
        # folded from the per-shard summary channel ("n"/"rows") plus the
        # ONE dv-bearing shard's sidecar — never a full materialization
        assert d["n_files"] == 8
        assert d["n_rows"] == 1000
        assert d["dv_dead_rows"] == 30
    finally:
        V._SHARD_INLINE_MAX = old
        shutil.rmtree(base, ignore_errors=True)


def test_reindex_refreshes_stale_text_indexes(spark):
    from tts_etl_pipeline_spark.sources.textindex import (
        build_text_index,
        read_version_token_pruned,
    )

    base = tempfile.mkdtemp(prefix="mnt_")
    try:
        path = f"{base}/t"
        df = spark.range(0, 50).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("alpha doc "), F.col("id").cast("string"))
            .alias("text"),
        )
        write_version(df, path)
        # an unindexed table never fires reindex
        assert auto_maintain(spark, path) == []
        build_text_index(spark, path, "text")
        write_version(  # head moves: v1's index is now stale
            spark.createDataFrame(
                [(99, "freshword here")], "doc_id long, text string"
            ),
            path, mode="append",
        )
        acts = auto_maintain(spark, path)
        assert [a["action"] for a in acts] == ["reindex"]
        hit, nread, _ = read_version_token_pruned(spark, path, "freshword")
        assert hit.count() == 1 and nread == 1
        assert auto_maintain(spark, path) == []  # fresh: nothing fires
        # opt-out honored
        write_version(
            spark.createDataFrame(
                [(100, "more text")], "doc_id long, text string"
            ),
            path, mode="append",
        )
        assert auto_maintain(spark, path, {"reindex_text": False}) == []
    finally:
        shutil.rmtree(base, ignore_errors=True)
