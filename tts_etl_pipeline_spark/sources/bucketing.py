"""Bucketed (co-located) tables: the shuffle-free fact-fact join pattern.

At 100 TB the dominant cost of a fact-fact join (orders x lineitem,
clicks x purchases) is shuffling BOTH sides on the join key every time the
join runs. Bucketing pays that shuffle ONCE at write time: each table is
hash-partitioned into a fixed number of buckets on the join key and every
bucket written pre-sorted, so any later join (or aggregation) on that key
reads matching buckets pairwise — zero Exchange in the plan, repeatable
across every downstream query of the same key. This is Spark's native
answer to the co-located layouts native engines get from their storage
managers, and it composes with everything else here (pushdown, AQE,
broadcast dims).

Rules the helper enforces (Spark silently degrades otherwise):
- bucket count must match on both sides of an intended co-located join
  (Spark can only co-locate equal bucket counts; mismatch = shuffle);
- buckets are written pre-sorted on the key so SortMergeJoin can also skip
  its per-task Sort when each bucket holds one file;
- written through the session catalog (`saveAsTable`) because bucket
  metadata lives in the catalog, not in parquet — a plain
  `.parquet(path)` write cannot carry it.

`tests/test_scale_patterns.py::test_bucketed_join_avoids_shuffle` pins the
zero-Exchange property against a real write + join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as a bucketed parquet table registered in the session
    catalog. `sort_cols` defaults to `bucket_cols` (pre-sorted buckets let
    SortMergeJoin skip its Sort). `path` places the files outside the
    warehouse dir (the catalog entry still carries the bucket spec)."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back. Must go through the catalog — reading
    the parquet path directly would drop the bucket spec and every join
    would shuffle again."""
    return spark.table(name)


def drop_bucketed(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
