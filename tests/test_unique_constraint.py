"""Enforced UNIQUE constraints (versioned.py add_unique_constraint /
_enforce_unique, driver query j39): every write path's enforcement arm,
the NULL-never-collides rule, drop semantics, and the pruned
cross-check staying sound under deletion vectors."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.versioned import (
    ConstraintViolationError,
    add_constraint,
    add_unique_constraint,
    current_version,
    delete_where_dv,
    drop_constraint,
    merge,
    read_version,
    table_constraints,
    write_version,
)


@pytest.fixture()
def t(spark):
    base = tempfile.mkdtemp(prefix="uq_")
    path = f"{base}/t"
    df = spark.range(1, 201).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    write_version(df.repartitionByRange(4, "k"), path, collect_stats=("k",))
    add_unique_constraint(spark, path, "pk", "k")
    yield path, df, spark
    shutil.rmtree(base, ignore_errors=True)


def test_unique_append_arms(t):
    path, df, spark = t
    # disjoint append commits
    write_version(
        df.withColumn("k", F.col("k") + 1000), path, mode="append",
        collect_stats=("k",),
    )
    # in-batch dup refuses
    with pytest.raises(ConstraintViolationError, match="duplicate"):
        write_version(
            df.limit(1).withColumn("k", F.lit(9_000).cast("long"))
            .unionByName(
                df.limit(1).withColumn("k", F.lit(9_000).cast("long"))
            ),
            path, mode="append",
        )
    # vs-table collision refuses (including against the SECOND commit)
    with pytest.raises(ConstraintViolationError, match="already exists"):
        write_version(
            spark.createDataFrame([(1050, 0.0)], "k long, v double"),
            path, mode="append",
        )
    assert current_version(path) == 3


def test_unique_nulls_never_collide(t):
    path, df, spark = t
    write_version(
        spark.createDataFrame(
            [(None, 1.0), (None, 2.0)], "k long, v double"
        ),
        path, mode="append",
    )
    got = read_version(spark, path)
    assert got.filter(F.col("k").isNull()).count() == 2


def test_unique_overwrite_and_merge_rewrites_pass(t):
    path, df, spark = t
    # an overwrite may repeat former values: the old rows retire with it
    write_version(df.limit(50), path, mode="overwrite", collect_stats=("k",))
    # a key-preserving merge rewrite re-stages surviving rows: no conflict
    src = read_version(spark, path).filter(F.col("k") <= 10).withColumn(
        "v", F.col("v") * 3
    )
    merge(spark, path, src, "k")
    assert read_version(spark, path).count() == 50


def test_unique_respects_deletion_vectors(t):
    path, df, spark = t
    # kill k=5 via DV, then re-insert it: a DEAD row is not a conflict
    delete_where_dv(spark, path, "k", 5, 5)
    write_version(
        spark.createDataFrame([(5, 99.0)], "k long, v double"),
        path, mode="append",
    )
    rows = read_version(spark, path).filter(F.col("k") == 5).collect()
    assert [(r["k"], r["v"]) for r in rows] == [(5, 99.0)]


def test_unique_drop_restores_writes(t):
    path, df, spark = t
    bad = spark.createDataFrame([(7, 0.0)], "k long, v double")
    with pytest.raises(ConstraintViolationError):
        write_version(bad, path, mode="append")
    drop_constraint(path, "pk")
    write_version(bad, path, mode="append")
    assert read_version(spark, path).filter(F.col("k") == 7).count() == 2


def test_unique_alter_guards(t):
    path, df, spark = t
    assert table_constraints(path) == {"pk": "unique:k"}
    with pytest.raises(ValueError, match="already exists"):
        add_unique_constraint(spark, path, "pk", "k")
    with pytest.raises(ValueError, match="not a column"):
        add_unique_constraint(spark, path, "x", "nope")
    with pytest.raises(ValueError, match="reserved"):
        add_constraint(spark, path, "sneaky", "unique:k")
    # CHECK and UNIQUE coexist on one table
    add_constraint(spark, path, "pos", "v >= 0")
    with pytest.raises(ConstraintViolationError, match="pos"):
        write_version(
            spark.createDataFrame([(9_999, -1.0)], "k long, v double"),
            path, mode="append",
        )
    with pytest.raises(ConstraintViolationError, match="UNIQUE"):
        write_version(
            spark.createDataFrame([(1, 1.0)], "k long, v double"),
            path, mode="append",
        )


def test_unique_cdc_upsert_updates_pass_and_inserts_check(t):
    """The CDC-upsert arm: upsert_where_eq's equality delete retires the
    old copies of its keys IN THE SAME COMMIT, so updating existing keys
    under a PK must commit (the review caught a draft refusing every
    legitimate update); genuinely new keys still insert; in-batch
    distinctness still enforced by the upsert's own guard."""
    from tts_etl_pipeline_spark.sources.versioned import upsert_where_eq

    path, df, spark = t
    batch = spark.createDataFrame(
        [(1, 111.0), (2, 222.0), (9_999, 9.0)], "k long, v double"
    )
    upsert_where_eq(batch, path, "k")
    got = {r["k"]: r["v"] for r in read_version(spark, path).collect()}
    assert got[1] == 111.0 and got[2] == 222.0 and got[9_999] == 9.0
    assert len(got) == 201  # 200 originals (2 updated in place) + 1 new
    # and a plain append still cross-checks (the exemption is scoped to
    # the eq-covered column of the upsert commit, not a blanket off)
    with pytest.raises(ConstraintViolationError, match="already exists"):
        write_version(
            spark.createDataFrame([(1, 0.0)], "k long, v double"),
            path, mode="append",
        )
