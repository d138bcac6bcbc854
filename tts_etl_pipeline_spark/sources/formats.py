"""Additional source/sink formats beyond parquet (engine completeness).

The reference reads a WAV directory and writes SQLite + WAV files; a general
engine also needs the interchange formats a data platform feeds it. All
readers take explicit schemas (no runtime inference on data paths — schema
inference is a full extra pass at 100 TB and non-deterministic under schema
drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True, **options
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> DataFrame:
    """Newline-delimited JSON (the standard large-scale JSON layout)."""
    return spark.read.schema(schema).options(**options).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partition-pruned layout — the at-rest default for large fact tables
    (readers with a filter on partition_cols skip whole directories)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return spark.read.schema(schema).orc(path)
