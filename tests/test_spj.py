"""Storage-partitioned joins (sources/spj.py) + the sbucket transform:
the hash-parity pins that make the feature sound, the zero-Exchange plan
pin, and every documented fallback arm."""

from __future__ import annotations

import os
import re

import pytest

from pyspark.sql import functions as F

from tts_etl_pipeline_spark.functions.murmur3 import bucket_id, spark_hash
from tts_etl_pipeline_spark.plans.inspect import count_shuffles, physical_plan
from tts_etl_pipeline_spark.sources.spj import (
    drop_spj_exposures,
    spj_compatibility,
    spj_join,
)
from tts_etl_pipeline_spark.sources.versioned import (
    alter_partition_spec,
    delete_where_dv,
    manifest,
    read_version,
    read_version_pruned,
    write_version,
)


# ------------------------------ murmur3 parity ------------------------------


def test_murmur3_matches_spark_hash(spark):
    """The pure-Python murmur3 must equal F.hash for every admitted type,
    across sign/boundary cases — the entire SPJ feature rests on this."""
    rows = spark.createDataFrame(
        [
            (1, 2**40 + 7, "hello"),
            (-5, -99999999999, ""),
            (0, 0, "a"),
            (2**31 - 1, 2**62, "日本語 text"),
            (-(2**31), -(2**63), "abcd"),
            (42, 2**63 - 1, "x" * 100),
        ],
        "i int, l long, s string",
    ).select(
        "i", "l", "s",
        F.hash("i").alias("hi"), F.hash("l").alias("hl"),
        F.hash("s").alias("hs"),
    ).collect()
    for r in rows:
        assert spark_hash(r.i, "integer") == r.hi, r.i
        assert spark_hash(r.l, "long") == r.hl, r.l
        assert spark_hash(r.s, "string") == r.hs, r.s


def test_sbucket_layout_matches_real_bucketby_write(spark, tmp_path):
    """A real bucketBy write and the sbucket transform must route every
    key to the SAME bucket id — parsed from Spark's own bucket file names
    vs computed by functions/murmur3.bucket_id."""
    import pyarrow.parquet as pq

    df = spark.range(0, 400).selectExpr("id as k")
    loc = str(tmp_path / "bucketed")
    (
        df.write.mode("overwrite").format("parquet")
        .bucketBy(8, "k").option("path", loc)
        .saveAsTable("spj_parity_probe")
    )
    try:
        seen = 0
        for root, _d, fns in os.walk(loc):
            for fn in fns:
                m = re.match(r".*_(\d+)(?:\..*)?$", fn)
                if not m or not fn.endswith(".parquet"):
                    continue
                b = int(m.group(1))
                for k in pq.read_table(os.path.join(root, fn))["k"].to_pylist():
                    assert bucket_id(k, "long", 8) == b, (k, b)
                    seen += 1
        assert seen == 400  # every row checked
    finally:
        spark.sql("DROP TABLE IF EXISTS spj_parity_probe")


# ------------------------------ the join itself ------------------------------


def _two_tables(spark, tmp_path, n=8, nb=None):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    dfa = spark.range(0, 3000).selectExpr("id as k", "id * 2 as va")
    dfb = spark.range(0, 3000, 3).selectExpr("id as k", "id * 7 as vb")
    write_version(dfa, pa, partition_by=(("sbucket", "k", n),))
    write_version(dfb, pb, partition_by=(("sbucket", "k", nb or n),))
    return pa, pb, dfa, dfb


def test_spj_join_zero_exchange_and_exact(spark, tmp_path):
    """THE pin: compatible sbucket layouts join with NO Exchange below the
    SortMergeJoin (broadcast disabled), and the values equal the plain
    join bit-for-bit."""
    pa, pb, dfa, dfb = _two_tables(spark, tmp_path)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j, colocated = spj_join(spark, pa, pb, "k")
        assert colocated
        plan = physical_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert count_shuffles(j) == 0, plan
        assert "Bucketed: true" in plan, plan
        got = {(r.k, r.va, r.vb) for r in j.collect()}
        want = {(r.k, r.va, r.vb) for r in dfa.join(dfb, "k").collect()}
        assert got == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        drop_spj_exposures(spark)


def test_spj_outer_join_and_reuse(spark, tmp_path):
    """Outer joins ride the same co-located layout (nulls from the probe
    side included), and a second join of the same snapshots REUSES the
    exposure (idempotent registration, no duplicate-table error)."""
    pa, pb, dfa, dfb = _two_tables(spark, tmp_path)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j, colocated = spj_join(spark, pa, pb, "k", how="left")
        assert colocated and count_shuffles(j) == 0
        assert j.count() == 3000
        assert j.filter(F.col("vb").isNull()).count() == 2000
        j2, again = spj_join(spark, pa, pb, "k")  # same snapshots: reuse
        assert again and j2.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        drop_spj_exposures(spark)


def test_spj_join_different_key_names(spark, tmp_path):
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    dfa = spark.range(0, 500).selectExpr("id as ka", "id * 2 as va")
    dfb = spark.range(0, 500, 5).selectExpr("id as kb", "id * 7 as vb")
    write_version(dfa, pa, partition_by=(("sbucket", "ka", 4),))
    write_version(dfb, pb, partition_by=(("sbucket", "kb", 4),))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j, colocated = spj_join(spark, pa, pb, ("ka", "kb"))
        assert colocated and count_shuffles(j) == 0
        assert j.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        drop_spj_exposures(spark)


def test_spj_string_keys(spark, tmp_path):
    """String keys exercise the byte-tail murmur3 path end-to-end."""
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    dfa = spark.range(0, 300).selectExpr(
        "concat('user-', id) as k", "id as va"
    )
    dfb = spark.range(0, 300, 2).selectExpr(
        "concat('user-', id) as k", "id * 3 as vb"
    )
    write_version(dfa, pa, partition_by=(("sbucket", "k", 4),))
    write_version(dfb, pb, partition_by=(("sbucket", "k", 4),))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j, colocated = spj_join(spark, pa, pb, "k")
        assert colocated and count_shuffles(j) == 0
        assert j.count() == 150
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        drop_spj_exposures(spark)


# ------------------------------ fallback arms ------------------------------


def test_spj_fallback_mismatched_bucket_counts(spark, tmp_path):
    pa, pb, dfa, dfb = _two_tables(spark, tmp_path, n=8, nb=4)
    j, colocated = spj_join(spark, pa, pb, "k")
    assert not colocated  # degraded, not refused
    assert j.count() == dfa.join(dfb, "k").count()
    with pytest.raises(ValueError, match="bucket counts differ"):
        spj_join(spark, pa, pb, "k", fallback=False)


def test_spj_fallback_evolved_spec_old_vintage(spark, tmp_path):
    """Files written BEFORE the sbucket spec carry no bucket tuple —
    guessing would mis-route their rows, so the join degrades."""
    pa = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    write_version(spark.range(0, 100).selectExpr("id as k", "id as va"), pa)
    alter_partition_spec(pa, (("sbucket", "k", 4),))
    write_version(
        spark.range(100, 200).selectExpr("id as k", "id as va"), pa,
        mode="append",
    )
    write_version(
        spark.range(0, 200).selectExpr("id as k", "id as vb"), pb,
        partition_by=(("sbucket", "k", 4),),
    )
    n, reason, _ = spj_compatibility(pa, pb, "k", "k")
    assert n is None and "no __p:sbucket" in reason
    j, colocated = spj_join(spark, pa, pb, "k")
    assert not colocated and j.count() == 200


def test_spj_fallback_pending_dvs(spark, tmp_path):
    """Merge-on-read state (a deletion vector) would be resurrected by a
    raw bucketed read — the join must degrade AND stay exact."""
    pa, pb, dfa, dfb = _two_tables(spark, tmp_path)
    delete_where_dv(spark, pa, "k", 10, 20)
    n, reason, _ = spj_compatibility(pa, pb, "k", "k")
    assert n is None and "deletion vectors" in reason
    j, colocated = spj_join(spark, pa, pb, "k")
    assert not colocated
    want = read_version(spark, pa).join(dfb, "k").count()
    assert j.count() == want


def test_spj_no_spec_at_all(spark, tmp_path):
    pa = str(tmp_path / "a")
    pb = str(tmp_path / "b")
    write_version(spark.range(10).selectExpr("id as k"), pa)
    write_version(spark.range(10).selectExpr("id as k"), pb)
    n, reason, _ = spj_compatibility(pa, pb, "k", "k")
    assert n is None and "does not sbucket" in reason


# ------------------------------ sbucket pruning ------------------------------


def test_sbucket_equality_probe_prunes_files(spark, tmp_path):
    """An equality probe on an sbucket layout must plan ~1/N of the files
    (the driver-side murmur3 twin) and return exactly the matching rows."""
    path = str(tmp_path / "t")
    write_version(
        spark.range(0, 4000).selectExpr("id as k", "id * 3 as v"),
        path,
        partition_by=(("sbucket", "k", 8),),
    )
    m = manifest(path, 1)
    assert len(m["files"]) == 8  # one group per live bucket
    got, skipped, total = read_version_pruned(spark, path, "k", 123, 123)
    assert total == 8 and skipped == 7  # exactly the key's bucket survives
    rows = got.filter("k = 123").collect()
    assert len(rows) == 1 and rows[0].v == 369
    # range probes cannot bound a hash bucket: no pruning, never a skip
    _, skipped2, _ = read_version_pruned(spark, path, "k", 10, 20)
    assert skipped2 == 0


def test_sbucket_string_probe_prunes(spark, tmp_path):
    path = str(tmp_path / "t")
    write_version(
        spark.range(0, 1000).selectExpr("concat('u', id) as k", "id as v"),
        path,
        partition_by=(("sbucket", "k", 8),),
    )
    got, skipped, total = read_version_pruned(spark, path, "k", "u77", "u77")
    assert skipped == total - 1
    assert got.filter("k = 'u77'").count() == 1
    # cross-type probe (numeric on a string sbucket) refuses to derive
    _, skipped2, _ = read_version_pruned(spark, path, "k", 77, 77)
    assert skipped2 == 0


def test_spj_read_zero_exchange_aggregation(spark, tmp_path):
    """The groupBy twin: an aggregation keyed on the sbucket column plans
    partial+final HashAggregate directly on the bucketed scan — zero
    Exchange — and the values equal the plain groupBy exactly."""
    from tts_etl_pipeline_spark.sources.spj import spj_read

    path = str(tmp_path / "t")
    df = spark.range(0, 5000).selectExpr("id % 400 as k", "id as v")
    write_version(df, path, partition_by=(("sbucket", "k", 8),))
    try:
        d, colocated = spj_read(spark, path, "k")
        assert colocated
        agg = d.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        plan = physical_plan(agg)
        assert count_shuffles(agg) == 0, plan
        got = {(r.k, r.s, r.n) for r in agg.collect()}
        want = {
            (r.k, r.s, r.n)
            for r in df.groupBy("k")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        }
        assert got == want
        # incompatible snapshot degrades (DV pending), stays exact
        delete_where_dv(spark, path, "k", 7, 7)
        d2, ok2 = spj_read(spark, path, "k")
        assert not ok2
        assert d2.count() == read_version(spark, path).count()
        with pytest.raises(ValueError, match="deletion vectors"):
            spj_read(spark, path, "k", fallback=False)
    finally:
        drop_spj_exposures(spark)


def test_spj_exposed_scan_bucket_prunes_equality_filter(spark, tmp_path):
    """Because the sbucket hash IS Spark's bucket hash, the claim made to
    the catalog is true — so Spark's own bucket pruning on an equality
    filter is CORRECT (SelectedBucketsCount 1 out of N) and returns
    exactly the matching rows. A mis-hashed layout would silently drop
    them; this pin is the soundness witness."""
    from tts_etl_pipeline_spark.sources.spj import spj_read

    path = str(tmp_path / "t")
    df = spark.range(0, 2000).selectExpr("id as k", "id * 3 as v")
    write_version(df, path, partition_by=(("sbucket", "k", 8),))
    # a filter-only query has no co-location benefit, so the planner's
    # auto-bucketed-scan heuristic would skip the bucket layout (and its
    # pruning) to keep parallelism — pin it on for the pruning witness
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        d, colocated = spj_read(spark, path, "k")
        assert colocated
        probe = d.filter(F.col("k") == 1234)
        plan = physical_plan(probe)
        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m and m.group(1) == "1" and m.group(2) == "8", plan
        rows = probe.collect()
        assert len(rows) == 1 and rows[0].v == 3702
    finally:
        spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        drop_spj_exposures(spark)


def test_spj_survives_compact_and_lineage(spark, tmp_path):
    """compact() keeps the declared sbucket layout (the overwrite lays
    out under the active spec), so SPJ stays zero-Exchange after
    maintenance — including on a row-lineage table, where the hidden
    materialized '__rid' column rides the partitioned stage."""
    from tts_etl_pipeline_spark.sources.spj import spj_join
    from tts_etl_pipeline_spark.sources.versioned import (
        compact,
        enable_row_lineage,
        read_version_lineage,
    )

    pa, pb, dfa, dfb = _two_tables(spark, tmp_path)
    enable_row_lineage(pa)
    ids = {r.k: r._row_id for r in read_version_lineage(spark, pa).collect()}
    # accrete a second file-per-bucket generation, then compact
    write_version(
        spark.range(3000, 3500).selectExpr("id as k", "id * 2 as va"), pa
    )
    compact(spark, pa, target_files=4)
    after = {r.k: r._row_id for r in read_version_lineage(spark, pa).collect()}
    assert all(after[k] == ids[k] for k in ids)  # lineage survived
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j, colocated = spj_join(spark, pa, pb, "k")
        assert colocated, "compact must preserve the sbucket layout"
        assert count_shuffles(j) == 0
        assert j.count() == dfa.join(dfb, "k").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        drop_spj_exposures(spark)


def test_spj_refuses_pending_initial_defaults(spark, tmp_path):
    """A pending add_column initial-default would read as NULL through
    the raw-parquet catalog exposure where read_version serves the
    default — wrong data, so both the join and the single-table read
    degrade/refuse instead."""
    import pyspark.sql.functions as F

    from tts_etl_pipeline_spark.sources.spj import (
        spj_compatibility,
        spj_read,
    )
    from tts_etl_pipeline_spark.sources.versioned import (
        add_column,
        write_version,
    )

    path = str(tmp_path / "t")
    df = spark.range(1, 201).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    write_version(df, path, partition_by=(("sbucket", "k", 8),))
    add_column(path, "note", "string", default="x")
    n, reason, _ = spj_compatibility(path, path, "k", "k")
    assert n is None and "initial-default" in reason
    d, colocated = spj_read(spark, path, "k")
    assert not colocated
    # the fallback read serves the DEFAULT, never NULL
    assert d.filter(F.col("note") == "x").count() == 200
