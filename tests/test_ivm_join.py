"""Join-aggregate IVM (sources/ivm.py, driver query st25): convergence
to the batch recompute under churn on both sides, the version-vector
exactly-once discipline, counterpart-read pruning, and the typed
guards."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.ivm import (
    maintain_join_agg_from_cdf,
    read_maintained_join_agg,
)
from tts_etl_pipeline_spark.sources.versioned import (
    read_version,
    write_version,
)


def _mk_ab(spark, base):
    pa, pb, st = f"{base}/a", f"{base}/b", f"{base}/st"
    a = spark.range(1, 501).select(
        F.col("id").alias("ak"),
        (F.col("id") % 5).cast("string").alias("g"),
    )
    b = spark.range(1, 1001).select(
        (F.col("id") % 500 + 1).alias("bk"),
        (F.col("id") * 7).alias("m"),
    )
    write_version(a.repartitionByRange(8, "ak"), pa, collect_stats=("ak",))
    write_version(b.repartitionByRange(8, "bk"), pb, collect_stats=("bk",))
    return pa, pb, st, a, b


def _recompute(a, b):
    return {
        (r["g"]): (r["cnt"], r["s"])
        for r in a.join(b, F.col("ak") == F.col("bk"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("m").alias("s"))
        .collect()
    }


def _state(spark, st):
    return {
        r["g"]: (r["cnt"], r["s"])
        for r in read_maintained_join_agg(spark, st).collect()
    }


def test_ivm_converges_and_replays_noop(spark):
    base = tempfile.mkdtemp(prefix="ivmj_")
    try:
        pa, pb, st, a, b = _mk_ab(spark, base)
        # churn: A deletes a slice, B appends a slice, A appends new keys
        write_version(
            read_version(spark, pa).filter(F.col("ak") % 10 != 0)
            .repartitionByRange(8, "ak"),
            pa, mode="overwrite", collect_stats=("ak",),
        )
        write_version(
            b.filter(F.col("bk") <= 20).withColumn("m", F.col("m") + 1)
            .repartitionByRange(2, "bk"),
            pb, mode="append", collect_stats=("bk",),
        )
        rep = maintain_join_agg_from_cdf(
            spark, pa, pb, st, "ak", "bk", "g", "m"
        )
        assert rep["a_steps"] == 2 and rep["b_steps"] == 2
        exp = _recompute(
            read_version(spark, pa), read_version(spark, pb)
        )
        assert _state(spark, st) == exp
        rep2 = maintain_join_agg_from_cdf(
            spark, pa, pb, st, "ak", "bk", "g", "m"
        )
        assert rep2["a_steps"] == 0 and rep2["b_steps"] == 0
        assert _state(spark, st) == exp
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ivm_resumes_mid_backlog(spark):
    base = tempfile.mkdtemp(prefix="ivmj_")
    try:
        pa, pb, st, a, b = _mk_ab(spark, base)
        maintain_join_agg_from_cdf(spark, pa, pb, st, "ak", "bk", "g", "m")
        # both sides advance AFTER the first drain
        write_version(
            a.filter(F.col("ak") <= 10).withColumn("ak", F.col("ak") + 1000),
            pa, mode="append", collect_stats=("ak",),
        )
        write_version(
            read_version(spark, pb).filter(F.col("bk") % 3 != 1)
            .repartitionByRange(8, "bk"),
            pb, mode="overwrite", collect_stats=("bk",),
        )
        rep = maintain_join_agg_from_cdf(
            spark, pa, pb, st, "ak", "bk", "g", "m"
        )
        assert rep["a_steps"] == 1 and rep["b_steps"] == 1
        assert _state(spark, st) == _recompute(
            read_version(spark, pa), read_version(spark, pb)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ivm_prunes_counterpart_by_delta_span(spark):
    base = tempfile.mkdtemp(prefix="ivmj_")
    try:
        pa, pb, st, a, b = _mk_ab(spark, base)
        maintain_join_agg_from_cdf(spark, pa, pb, st, "ak", "bk", "g", "m")
        # a CONFINED A-delta (keys 1..12) against key-clustered B (8 range
        # files): the B@vb read must skip the files outside the span
        write_version(
            a.filter(F.col("ak") <= 12).withColumn("g", F.lit("9")),
            pa, mode="append", collect_stats=("ak",),
        )
        rep = maintain_join_agg_from_cdf(
            spark, pa, pb, st, "ak", "bk", "g", "m"
        )
        assert rep["files_total"] > 0
        assert rep["files_skipped"] >= rep["files_total"] - 2
        assert _state(spark, st) == _recompute(
            read_version(spark, pa), read_version(spark, pb)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ivm_null_groups_are_real_groups(spark):
    base = tempfile.mkdtemp(prefix="ivmj_")
    try:
        pa, pb, st = f"{base}/a", f"{base}/b", f"{base}/st"
        a = spark.createDataFrame(
            [(1, None), (2, "x"), (3, None)], "ak long, g string"
        )
        b = spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30), (3, 40)], "bk long, m long"
        )
        write_version(a, pa, collect_stats=("ak",))
        write_version(b, pb, collect_stats=("bk",))
        maintain_join_agg_from_cdf(spark, pa, pb, st, "ak", "bk", "g", "m")
        assert _state(spark, st) == {None: (3, 80), "x": (1, 20)}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ivm_typed_guards(spark):
    base = tempfile.mkdtemp(prefix="ivmj_")
    try:
        pa, pb, st = f"{base}/a", f"{base}/b", f"{base}/st"
        a = spark.createDataFrame([(1, "x")], "ak long, g string")
        bf = spark.createDataFrame([(1, 1.5)], "bk long, m double")
        write_version(a, pa)
        with pytest.raises(ValueError, match="committed version"):
            maintain_join_agg_from_cdf(
                spark, pa, pb, st, "ak", "bk", "g", "m"
            )
        write_version(bf, pb)
        with pytest.raises(ValueError, match="integral"):
            maintain_join_agg_from_cdf(
                spark, pa, pb, st, "ak", "bk", "g", "m"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_components_ivm_converges_and_resumes(spark):
    from tts_etl_pipeline_spark.functions.graph import connected_components
    from tts_etl_pipeline_spark.sources.ivm import (
        maintain_components_from_cdf,
        read_maintained_components,
    )

    base = tempfile.mkdtemp(prefix="civm_")
    pe, st = f"{base}/e", f"{base}/st"
    try:
        # chains of <= 7 nodes, fragments spread over three commits
        edges = (
            spark.range(1, 401)
            .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
            .filter(F.col("a") % 7 != 0)
        )
        write_version(edges.filter(F.col("a") % 3 == 0), pe)
        write_version(edges.filter(F.col("a") % 3 == 1), pe, mode="append")
        rep1 = maintain_components_from_cdf(spark, pe, st)
        assert rep1["steps"] == 2
        write_version(edges.filter(F.col("a") % 3 == 2), pe, mode="append")
        rep2 = maintain_components_from_cdf(spark, pe, st)
        assert rep2["steps"] == 1 and rep2["label_merges"] > 0
        got = {
            r["node"]: r["component"]
            for r in read_maintained_components(spark, st).collect()
        }
        exp = {
            r["node"]: r["label"]
            for r in connected_components(
                edges.selectExpr("a AS src", "b AS dst")
            ).collect()
        }
        assert got == exp
        assert maintain_components_from_cdf(spark, pe, st)["steps"] == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_components_ivm_refuses_deletes_and_nulls(spark):
    from tts_etl_pipeline_spark.sources.ivm import (
        maintain_components_from_cdf,
    )

    base = tempfile.mkdtemp(prefix="civm_")
    pe, st = f"{base}/e", f"{base}/st"
    try:
        edges = spark.createDataFrame(
            [(1, 2), (2, 3)], "a long, b long"
        )
        write_version(edges, pe)
        maintain_components_from_cdf(spark, pe, st)
        write_version(edges.limit(1), pe, mode="overwrite")  # a delete
        with pytest.raises(ValueError, match="append-only"):
            maintain_components_from_cdf(spark, pe, st)
        pe2, st2 = f"{base}/e2", f"{base}/st2"
        write_version(
            spark.createDataFrame([(1, None)], "a long, b long"), pe2
        )
        with pytest.raises(ValueError, match="NULL endpoints"):
            maintain_components_from_cdf(spark, pe2, st2)
    finally:
        shutil.rmtree(base, ignore_errors=True)
