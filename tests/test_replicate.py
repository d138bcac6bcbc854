"""Incremental replication (sources/replicate.py, driver query j37):
delta-only sync, byte-identical history on the replica (every version
time-travels equal), the closure rule (sidecars nested in shard
payloads ship too), WAP-branch survival, and the typed refusals
(diverged destination, vacuumed source)."""

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.replicate import (
    ReplicaDivergedError,
    replicate,
)
from tts_etl_pipeline_spark.sources.versioned import (
    create_branch,
    current_version,
    delete_where_dv,
    history,
    manifest,
    read_branch,
    read_version,
    write_version,
)


def _rows(spark, path, v=None):
    return sorted(map(tuple, read_version(spark, path, v).collect()))


def test_replicate_full_history_then_delta_only(spark):
    base = tempfile.mkdtemp(prefix="repl_")
    src, dst = f"{base}/src", f"{base}/dst"
    try:
        df = spark.range(1, 501).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("p")
        )
        write_version(
            df.repartitionByRange(4, "k"), src,
            collect_stats=("k",), collect_blooms=("k",),
        )
        write_version(
            df.withColumn("k", F.col("k") + 1000), src, mode="append",
            collect_stats=("k",),
        )
        r1 = replicate(src, dst)
        assert r1["versions_synced"] == 2 and r1["files_copied"] > 0
        # every version of the lineage serves identically on the replica
        for v in (1, 2):
            assert _rows(spark, src, v) == _rows(spark, dst, v)
        assert [h["version"] for h in history(dst)] == [1, 2]
        # incremental: a third commit ships ONLY its delta
        write_version(
            df.limit(10).withColumn("k", F.col("k") + 5000), src,
            mode="append", collect_stats=("k",),
        )
        r2 = replicate(src, dst)
        assert r2["versions_synced"] == 1
        new_files = set(manifest(src, 3)["files"]) - set(
            manifest(src, 2)["files"]
        )
        assert r2["files_copied"] == len(new_files)
        assert _rows(spark, src) == _rows(spark, dst)
        # idempotent: nothing left to ship
        r3 = replicate(src, dst)
        assert r3["versions_synced"] == 0 and r3["files_copied"] == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_replicate_ships_dv_sidecars_and_branches(spark):
    base = tempfile.mkdtemp(prefix="repl_")
    src, dst = f"{base}/src", f"{base}/dst"
    try:
        df = spark.range(1, 101).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("p")
        )
        write_version(df.repartitionByRange(4, "k"), src, collect_stats=("k",))
        delete_where_dv(spark, src, "k", 5, 9)
        create_branch(src, "wap")
        write_version(
            df.limit(3).withColumn("k", F.col("k") + 900), src,
            mode="append", branch="wap",
        )
        replicate(src, dst)
        # the DV applies on the replica (sidecar shipped)
        assert {r[0] for r in _rows(spark, dst)} == set(range(1, 101)) - set(
            range(5, 10)
        )
        # the staged WAP branch survives failover, content identical
        assert sorted(
            map(tuple, read_branch(spark, dst, "wap").collect())
        ) == sorted(map(tuple, read_branch(spark, src, "wap").collect()))
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_replicate_sharded_manifest_closure(spark):
    """A table pushed past the inline-manifest envelope stores per-file
    payloads in shard sidecars; the walker must ship the shards AND the
    sidecars the shard payloads reference."""
    import tts_etl_pipeline_spark.sources.versioned as V

    base = tempfile.mkdtemp(prefix="repl_")
    src, dst = f"{base}/src", f"{base}/dst"
    old = V._SHARD_INLINE_MAX
    V._SHARD_INLINE_MAX = 4  # force sharding at tiny file counts
    try:
        df = spark.range(1, 201).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("p")
        )
        write_version(
            df.repartitionByRange(8, "k"), src,
            collect_stats=("k",), collect_blooms=("k",),
        )
        raw = json.load(open(V._manifest_path(src, 1)))
        assert "shards" in raw, "fixture must exercise the sharded layout"
        replicate(src, dst)
        assert _rows(spark, src) == _rows(spark, dst)
        # bloom sidecars referenced only from INSIDE shard payloads came too
        blooms = [
            f
            for f in os.listdir(os.path.join(dst, "_versions"))
            if f.startswith("blooms-")
        ]
        assert blooms
    finally:
        V._SHARD_INLINE_MAX = old
        shutil.rmtree(base, ignore_errors=True)


def test_replicate_refusals(spark):
    base = tempfile.mkdtemp(prefix="repl_")
    src, dst = f"{base}/src", f"{base}/dst"
    try:
        df = spark.range(1, 51).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("p")
        )
        write_version(df, src)
        replicate(src, dst)
        # divergence: the destination takes its own commit
        write_version(df.limit(1), dst, mode="append")
        write_version(df.limit(2), src, mode="append")
        with pytest.raises(ReplicaDivergedError):
            replicate(src, dst)
        # vacuumed hole: a referenced data file disappears from source
        src2, dst2 = f"{base}/src2", f"{base}/dst2"
        write_version(df, src2)
        victim = manifest(src2, 1)["files"][0]
        os.remove(os.path.join(src2, victim))
        with pytest.raises(ValueError, match="vacuumed"):
            replicate(src2, dst2)
        # and the half-sync left no committed version behind
        assert current_version(dst2) == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
