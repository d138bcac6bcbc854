"""Checkpoint strategy for plan-reuse materialization (VERDICT r2 item 8).

Several operators materialize an intermediate exactly once so that multiple
downstream branches read it without re-deriving the lineage (the
"materialize the inverted index" step of a dedup pipeline, the pre-agg a
scalar-subquery query reads at two grains, both sides of a set-op). Spark
has no automatic DAG reuse across actions, so without materialization each
branch re-scans the source — tests/test_plans.py pins the one-scan property.

The mechanism differs by deployment:

- **local / single-JVM** (tests, bench, the driver's local[32]):
  ``localCheckpoint`` — blocks live in executor-local block storage. Cheap,
  but blocks die with an executor, so on a real cluster an executor loss
  makes every downstream job fail irrecoverably.
- **cluster**: reliable ``checkpoint`` against the fault-tolerant directory
  configured via ``spark.sparkContext.setCheckpointDir`` (HDFS/object
  store). Survives executor loss; costs a write to distributed storage.

``materialize`` picks automatically: reliable when a checkpoint dir is
configured, local otherwise. Operators call this ONE helper, so flipping a
whole deployment to reliable checkpointing is a single ``setCheckpointDir``
call at session setup — no per-operator code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize `df`, truncating lineage, and return the
    materialized frame. Reliable checkpoint if a checkpoint dir is set on
    the SparkContext, else executor-local checkpoint."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
