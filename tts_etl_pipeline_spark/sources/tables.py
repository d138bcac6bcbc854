"""Parquet table loaders for the driver's deterministic test tables.

The star schema (region..lineitem), the events stream table, the documents
corpus and the embeddings vector table are described in FIXTURES.md. At
100 TB these would be partitioned (e.g. lineitem by l_shipdate month,
events by ts date) — partition pruning then composes with the predicate
pushdown that the plain `spark.read.parquet` path already gets us.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions that should always be broadcast in joins (region: 5 rows,
# nation: 25, supplier/part/customer grow slowly with sf but stay far below
# any reasonable broadcast threshold at bench scale).
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # The driver runs queries with ITS OWN session whose timezone is not
    # ours to configure up front. Every NTZ->timestamp->epoch cast (session-
    # ization, as-of gaps, streaming watermarks) assumes UTC wall time, so
    # pin it here on the query path (runtime-settable SQL conf).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (older driver
    fixtures) and TIMESTAMP(MICROS) (current ones), so branch on the footer
    type at read time instead of hard-coding a vintage:

    - nanos: Spark's vectorized reader rejects TIMESTAMP(NANOS); with the
      legacy ``nanosAsLong`` conf it arrives as int64 nanos, converted via
      integer division (`div`, never `/` — ~1.7e18 exceeds double's 53-bit
      mantissa).
    - micros/millis: arrives as a timestamp already; just normalize to
      TIMESTAMP_NTZ (session tz is pinned to UTC above, so wall times are
      identical either way).

    The schema probe is a parquet-footer read only — no data scan."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):  # TIMESTAMP(NANOS)
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:  # TIMESTAMP(MICROS)/(MILLIS) — already a timestamp column
        ts = F.col("ts")
    return df.withColumn("ts", ts.cast("timestamp_ntz"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL API path)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
