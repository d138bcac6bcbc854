"""Sinks S3-S5 (pa.py:49-76, 335-391).

- `create_table` / `insert_or_ignore`: the SQLite DDL + `INSERT OR IGNORE`
  surface re-expressed as a Parquet table with first-writer-wins append:
  dedup within the incoming batch on the key, then LEFT ANTI join against the
  existing table's keys, then append (SURVEY §2.1-S4). The anti join's build
  side is keys-only — at 100 TB the sink table's key column is a fraction of
  the data and the join is AQE-optimized; with Delta available this becomes
  MERGE WHEN NOT MATCHED.
- `export_wavs`: per-row WAV file sink via foreachPartition-style
  mapInPandas (Spark has no native per-row binary sink); failures yield a
  null wav_path which the F7 filter drops (pa.py:348-352).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.audio import params as P


def insert_or_ignore(
    df: DataFrame, table_path: str, key: str = "wav_path"
) -> int:
    """Append rows whose `key` is not already present (first writer wins).

    Returns the number of rows appended. Replicates INSERT OR IGNORE
    (pa.py:377-383) including intra-batch duplicates (executemany applies
    rows in order; we keep an arbitrary single row per key via
    dropDuplicates, matching the reference's per-batch uniqueness).

    Concurrency: single-writer only, like the SQLite original. The
    read-keys/anti-join/append sequence is not transactional — two writers
    racing on the same table can both miss the other's keys and append
    duplicates. A multi-writer deployment needs a table format with
    optimistic transactions (Delta/Iceberg MERGE WHEN NOT MATCHED).
    """
    spark = df.sparkSession
    incoming = df.dropDuplicates([key])
    if _table_exists(spark, table_path):
        existing_keys = spark.read.parquet(table_path).select(key)
        incoming = incoming.join(existing_keys, key, "left_anti")
    # persist before count+write: without it the count action and the write
    # action would each execute the FULL upstream DAG (in run_pipeline that
    # means decode, ASR inference, and the side-effecting WAV export — twice),
    # and a nondeterministic upstream could write different rows than counted
    incoming = incoming.persist()
    try:
        n = incoming.count()
        if n:
            incoming.write.mode("append").parquet(table_path)
    finally:
        incoming.unpersist()
    return n


def create_table(spark: SparkSession, table_path: str, refresh: bool = True) -> None:
    """S3 (pa.py:49-76): refresh=True drops existing data first."""
    if refresh and _table_exists(spark, table_path):
        import shutil

        shutil.rmtree(table_path)


def _table_exists(spark: SparkSession, path: str) -> bool:
    if not os.path.isdir(path):
        return False
    # walk: partitioned layouts keep part files in key=value subdirectories
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def clip_filename(stem_col, start_col, end_col):
    """P9 (pa.py:339-343): {stem}_{start_s:04d}s_{end_s:04d}s.wav with
    integer-second zero padding."""
    return F.format_string(
        "%s_%04ds_%04ds.wav",
        stem_col,
        F.floor(start_col / 1000).cast("long"),
        F.floor(end_col / 1000).cast("long"),
    )


def export_wavs(segments_df: DataFrame, out_dir: str) -> DataFrame:
    """S5 (pa.py:335-352): write each segment's padded samples as a WAV clip;
    wav_path column holds the written path or null on failure."""
    os.makedirs(out_dir, exist_ok=True)
    stem = F.regexp_replace("original_name", r"\.wav$", "")
    named = segments_df.withColumn(
        "wav_name", clip_filename(stem, F.col("start_ms"), F.col("end_ms"))
    )
    fields = named.schema.fields
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields if f.name != "wav_name"
    )
    out_schema += ", wav_path string"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import wave as wave_mod

        for pdf in batches:
            paths = []
            for samples, rate, name in zip(
                pdf["samples"], pdf["frame_rate"], pdf["wav_name"]
            ):
                path = os.path.join(out_dir, name)
                try:
                    ints = (
                        np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
                        * P.INT16_FULL_SCALE
                    ).astype("<i2")
                    with wave_mod.open(path, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(int(rate))
                        w.writeframes(ints.tobytes())
                    paths.append(path)
                except Exception:
                    paths.append(None)  # pa.py:348-352 -> dropped by F7
            pdf = pdf.drop(columns=["wav_name"]).copy()
            pdf["wav_path"] = paths
            yield pdf

    return named.mapInPandas(gen, out_schema)


def overwrite_partitions(df: DataFrame, table_path: str, partition_cols: list[str]) -> None:
    """Incremental backfill: replace ONLY the partitions present in `df`,
    leaving all other partitions untouched (dynamic partition overwrite).

    The canonical reprocess-one-day pattern for a 100 TB date-partitioned
    table — a static overwrite would truncate the whole table, and
    read-modify-write of the full dataset is O(table) instead of O(day).
    Spark handles this natively via partitionOverwriteMode=dynamic; the
    config is set per-write here (it is session-wide, so restore after).
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(table_path)
    finally:
        spark.conf.set(key, prev)


def compact_parquet(
    spark: SparkSession, table_path: str, target_file_mb: int = 512
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(bytes / target_file_mb) files and swap it in with crash recovery.

    Streaming sinks and fine-grained backfills accrete thousands of tiny
    files; at cluster scale every one is a scan task and a NameNode entry.
    Rewrite is a zero-shuffle coalesce when shrinking (repartition only to
    grow parallelism), staged to a sibling path then swapped in. Returns
    the output file count.

    Atomicity contract (single-writer, like a filesystem table without a
    transaction log): the swap is two renames, so a crash can leave the
    table briefly absent with the data parked at `<table>._compact_old`.
    Both this function (on its next run) and `recover_compaction` roll that
    state back, so no committed data is ever lost — but a concurrent READER
    between the renames can observe a missing table. Concurrent
    reader-safety needs a catalog/table format (Delta/Iceberg) whose commit
    is a single metadata swap; this is documented, not claimed.
    """
    import math
    import shutil

    recover_compaction(table_path)  # roll back any crashed previous swap
    size_b = 0
    for root, _dirs, files in os.walk(table_path):
        size_b += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    n_files = max(1, math.ceil(size_b / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(table_path)
    staged = table_path.rstrip("/") + "._compact_tmp"
    df.coalesce(n_files).write.mode("overwrite").parquet(staged)
    old = table_path.rstrip("/") + "._compact_old"
    shutil.rmtree(old, ignore_errors=True)  # leftover from an aborted run
    os.rename(table_path, old)
    try:
        os.rename(staged, table_path)
    except OSError:
        os.rename(old, table_path)  # roll the original back in
        raise
    shutil.rmtree(old)
    return n_files


def recover_compaction(table_path: str) -> bool:
    """Recover a table stranded by a crash between compact_parquet's two
    renames: if the table path is gone but `<table>._compact_old` exists,
    rename the original data back in. Returns True if a rollback happened.
    Safe to call unconditionally at startup; compact_parquet calls it first.
    """
    old = table_path.rstrip("/") + "._compact_old"
    if not os.path.exists(table_path) and os.path.isdir(old):
        os.rename(old, table_path)
        return True
    return False
