"""Versioned parquet tables (sources/versioned.py): snapshot isolation,
time travel, rollback, vacuum safety."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.versioned import (
    current_version,
    history,
    read_version,
    rollback,
    vacuum,
    write_version,
)


def _counts(df):
    return sorted(map(tuple, df.groupBy("k").count().collect()))


def test_append_overwrite_time_travel_and_rollback(spark, tmp_path):
    path = str(tmp_path / "tbl")
    v1 = write_version(spark.range(5).select(F.lit("a").alias("k"), "id"), path)
    v2 = write_version(spark.range(3).select(F.lit("b").alias("k"), "id"), path)
    assert (v1, v2) == (1, 2)
    assert read_version(spark, path, 1).count() == 5
    assert read_version(spark, path, 2).count() == 8  # append folds v1 + v2
    v3 = write_version(
        spark.range(2).select(F.lit("c").alias("k"), "id"), path, mode="overwrite"
    )
    assert read_version(spark, path).count() == 2  # latest = overwritten
    assert read_version(spark, path, 2).count() == 8  # time travel intact
    v4 = rollback(path, 2)
    assert v4 == 4 and current_version(path) == 4
    assert read_version(spark, path).count() == 8  # restored content
    assert [h["version"] for h in history(path)] == [1, 2, 3, 4]
    assert history(path)[3]["mode"] == "rollback"


def test_reader_snapshot_isolated_from_later_commits(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_version(spark.range(10).select(F.lit("x").alias("k"), "id"), path)
    snapshot = read_version(spark, path, 1)  # plan pinned to v1's files
    write_version(spark.range(90).select(F.lit("y").alias("k"), "id"), path)
    assert snapshot.count() == 10  # unaffected by the later commit
    assert read_version(spark, path).count() == 100


def test_vacuum_removes_only_unreferenced_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_version(spark.range(4).select(F.lit("a").alias("k"), "id"), path)
    write_version(
        spark.range(6).select(F.lit("b").alias("k"), "id"), path, mode="overwrite"
    )
    before = set(os.listdir(os.path.join(path, "data")))
    deleted = vacuum(path, keep_versions=1)
    after = set(os.listdir(os.path.join(path, "data")))
    assert {os.path.join("data", f) for f in before - after} == set(deleted)
    assert deleted  # v1's files were unreferenced by the latest version
    # the retained version still reads fine; the vacuumed one is gone
    assert read_version(spark, path).count() == 6
    with pytest.raises(Exception):
        read_version(spark, path, 1).count()


def test_errors_on_missing_versions_and_bad_mode(spark, tmp_path):
    path = str(tmp_path / "tbl")
    with pytest.raises(ValueError):
        read_version(spark, path)
    write_version(spark.range(1).select(F.lit("a").alias("k"), "id"), path)
    with pytest.raises(ValueError):
        read_version(spark, path, 7)
    with pytest.raises(ValueError):
        rollback(path, 9)
    with pytest.raises(ValueError):
        write_version(spark.range(1), path, mode="merge")


def test_merge_upsert_update_insert_delete(spark, tmp_path):
    from tts_etl_pipeline_spark.sources.versioned import merge_upsert

    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame(
            [(1, "one", 10), (2, "two", 20), (3, "three", 30)], "k long, name string, v long"
        ),
        path,
    )
    source = spark.createDataFrame(
        [(2, "TWO", 200), (4, "four", 40), (3, "three", -1)], "k long, name string, v long"
    )
    v = merge_upsert(spark, path, source, key="k", delete_on="v < 0")
    assert v == 2
    got = {r["k"]: (r["name"], r["v"]) for r in read_version(spark, path).collect()}
    assert got == {
        1: ("one", 10),     # untouched target row passes through
        2: ("TWO", 200),    # matched -> update (source wins)
        4: ("four", 40),    # not matched -> insert
    }                        # 3 deleted by the delete_on clause
    # time travel still shows the pre-merge state
    pre = {r["k"] for r in read_version(spark, path, 1).collect()}
    assert pre == {1, 2, 3}


def test_merge_upsert_schema_mismatch_raises(spark, tmp_path):
    from tts_etl_pipeline_spark.sources.versioned import merge_upsert

    path = str(tmp_path / "tbl")
    write_version(spark.createDataFrame([(1, "a")], "k long, name string"), path)
    bad = spark.createDataFrame([(1, 2.0)], "k long, score double")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(spark, path, bad, key="k")


def test_merge_upsert_edge_semantics(spark, tmp_path):
    """The Delta-contract guards: NULL delete predicate falls through to
    UPDATE; NULL source keys insert (never match, never emit ghost rows);
    duplicate source keys raise; type changes raise."""
    from tts_etl_pipeline_spark.sources.versioned import merge_upsert

    path = str(tmp_path / "tbl")
    write_version(
        spark.createDataFrame([(1, "one", 10), (2, "two", 20)], "k long, name string, v long"),
        path,
    )
    # NULL v -> delete_on 'v < 0' is NULL -> must UPDATE, not delete
    src = spark.createDataFrame([(2, "TWO", None)], "k long, name string, v long")
    merge_upsert(spark, path, src, key="k", delete_on="v < 0")
    got = {r["k"]: (r["name"], r["v"]) for r in read_version(spark, path).collect()}
    assert got == {1: ("one", 10), 2: ("TWO", None)}
    # NULL key -> INSERT as its own row, no all-NULL ghost rows
    src = spark.createDataFrame([(None, "nullkey", 5)], "k long, name string, v long")
    merge_upsert(spark, path, src, key="k")
    rows = read_version(spark, path).collect()
    assert len(rows) == 3
    assert any(r["k"] is None and r["name"] == "nullkey" for r in rows)
    assert not any(r["k"] is None and r["name"] is None and r["v"] is None for r in rows)
    # duplicate keys raise
    dup = spark.createDataFrame([(1, "a", 1), (1, "b", 2)], "k long, name string, v long")
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_upsert(spark, path, dup, key="k")
    # same names, different type -> schema mismatch
    typed = spark.createDataFrame([(1, "a", 1.5)], "k long, name string, v double")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(spark, path, typed, key="k")
    # delete_on containing a column name inside a string literal: the
    # literal must NOT be rewritten — no row has name == 'v', so nothing
    # is deleted and the matched row updates normally
    lit = spark.createDataFrame([(1, "ONE", 11)], "k long, name string, v long")
    merge_upsert(spark, path, lit, key="k", delete_on="name = 'v'")
    got = {r["k"]: r["name"] for r in read_version(spark, path).collect() if r["k"] == 1}
    assert got == {1: "ONE"}


def test_rollback_to_vacuumed_version_refuses(spark, tmp_path):
    path = str(tmp_path / "tbl")
    write_version(spark.range(4).select(F.lit("a").alias("k"), "id"), path)
    write_version(spark.range(6).select(F.lit("b").alias("k"), "id"), path, mode="overwrite")
    assert vacuum(path, keep_versions=1)
    with pytest.raises(ValueError, match="vacuumed"):
        rollback(path, 1)
    # head still healthy
    assert read_version(spark, path).count() == 6


def test_vacuum_noop_and_orphan_manifest_invisible(spark, tmp_path):
    import json
    import os as _os

    path = str(tmp_path / "tbl")
    assert vacuum(path) == []  # nothing committed: maintenance no-op
    write_version(spark.range(3).select(F.lit("a").alias("k"), "id"), path)
    # simulate a torn crash: manifest v2 written, _latest never updated
    orphan = _os.path.join(path, "_versions", "v00000002.json")
    with open(orphan, "w") as fh:
        json.dump({"version": 2, "files": ["data/ghost.parquet"], "parent": 1}, fh)
    # uncommitted version is invisible to readers...
    with pytest.raises(ValueError):
        read_version(spark, path, 2)
    assert read_version(spark, path).count() == 3
    # ...and vacuum removes the orphan manifest so no later commit can
    # collide with it
    vacuum(path)
    assert not _os.path.exists(orphan)
