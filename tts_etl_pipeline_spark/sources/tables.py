"""Parquet table loaders for the driver's deterministic test tables.

The star schema (region..lineitem), the events stream table, the documents
corpus and the embeddings vector table are described in FIXTURES.md. At
100 TB these would be partitioned (e.g. lineitem by l_shipdate month,
events by ts date) — partition pruning then composes with the predicate
pushdown that the plain `spark.read.parquet` path already gets us.
"""

from __future__ import annotations

import os

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

# Broadcast policy: only region (5 rows) and nation (25) are ALWAYS
# broadcastable; supplier/part/customer/embeddings grow linearly with SF
# and must go through the size guard below (a hard hint on them is the
# round-6 verdict's 100x-OOM finding).

# On-disk parquet bytes above which a side gets NO broadcast hint. Parquet
# decompresses ~2-5x into the broadcast hash relation, so 32 MiB on disk
# keeps the in-memory relation comfortably inside executor/driver budgets;
# above the bound AQE's runtime size check chooses the join strategy.
BROADCAST_LIMIT_BYTES = 32 << 20


def table_disk_bytes(sf_dir: str, name: str) -> int | None:
    """On-disk size of a test table's parquet (single file or directory):
    the cheap, always-available stand-in for catalog statistics that sizes
    the maybe_broadcast guard. None when the path cannot be statted."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(root, f))
                for root, _, fs in os.walk(path)
                for f in fs
            )
    except OSError:
        pass
    return None


def maybe_broadcast(
    df: DataFrame,
    size_bytes: int | None,
    limit_bytes: int = BROADCAST_LIMIT_BYTES,
) -> DataFrame:
    """SIZE-GUARDED broadcast hint (round-6 verdict finding 1): hint only
    when the side is measured under `limit_bytes`; otherwise return it
    unhinted so AQE's runtime size check picks the strategy. A hard
    F.broadcast on an SF-scaling side (customer/supplier/part/embeddings
    all grow linearly with scale factor) BYPASSES AQE's size check, so the
    plan that is optimal at sf0.1 becomes a driver/executor OOM at 100x.
    Unconditional hints stay reserved for genuinely bounded sides:
    nation/region, 1-row totals, calendar-grain rollups, per-group mid
    tables, query vectors.

    `size_bytes` is the caller's evidence — normally table_disk_bytes() of
    the side's BASE table, a conservative upper bound for any filtered /
    projected / joined derivation of it. NOT conservative for EXPLODED
    derivations (gram/shingle/epoch-replicated relations can exceed their
    source bytes many times over): scale the evidence by the expansion
    factor there, as d13's gram side does. None (unknown size) = no hint."""
    from pyspark.sql import functions as F

    if size_bytes is not None and size_bytes <= limit_bytes:
        return F.broadcast(df)
    return df


def scaled_broadcast(
    df: DataFrame, sf_dir: str, base_table: str, expansion: float = 1.0
) -> DataFrame:
    """maybe_broadcast sized by `base_table`'s on-disk bytes — the one-line
    guard for join sides derived from a single SF-scaling base table.
    `expansion` scales the evidence for derivations LARGER than their
    source (gram/shingle explosions, epoch replication), where base bytes
    alone are not conservative — see d13's 16x gram side."""
    size = table_disk_bytes(sf_dir, base_table)
    return maybe_broadcast(df, None if size is None else int(size * expansion))


# --- scan-parallelism rebalance (optimization guide §2.5 "input skew") ----
#
# A parquet file with one row group is effectively UNSPLITTABLE: Spark may
# cut it into byte-range splits, but the reader assigns each row group to
# the single split holding its midpoint, so one task decodes everything and
# the rest no-op. The driver's fixtures are exactly that shape (one file,
# one row group per table), which serializes every downstream per-row
# computation that runs in the scan stage — decimal partial aggregates,
# regex scrubbing, tokenization — on one core (measured: q1's scan+partial
# agg stage 1.0 s single-reader while 31 cores idle, g6 1.2 s, d13's gram
# explode 1.2 s).
#
# `rebalance_scan` is the guide's fix ("repartition immediately after the
# read"), GUARDED so it is a no-op wherever the scan already parallelizes
# naturally: it fires only when the table's estimated split count is below
# the session's core count AND the table is big enough for a shuffle to be
# worth it. At production scale (thousands of files) the guard always
# declines, so the plan carries no extra Exchange; the threshold also keeps
# the sf0.001 pytest fixtures (max 194 KB) out, so plan pins stay exact.
# Callers apply it ONLY where the scan stage carries heavy per-row work —
# a scan feeding a key shuffle (join/window) gains nothing from an extra
# round-robin exchange and never calls this.

REBALANCE_MIN_BYTES = 512 << 10  # below this, a shuffle costs more than it buys
_SPLIT_BYTES = 128 << 20  # spark.sql.files.maxPartitionBytes default


def _natural_splits(sf_dir: str, name: str) -> tuple[int, int]:
    """(estimated scan split count, total bytes) for a test table's parquet.
    Split estimate is files-granular (ceil(size / 128 MB) per file) — a
    LOWER bound Spark can only beat, which makes the guard conservative:
    we decline to rebalance as soon as the layout itself parallelizes."""
    import math

    path = os.path.join(sf_dir, f"{name}.parquet")
    files: list[int] = []
    try:
        if os.path.isfile(path):
            files = [os.path.getsize(path)]
        elif os.path.isdir(path):
            files = [
                os.path.getsize(os.path.join(root, f))
                for root, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            ]
    except OSError:
        pass
    if not files:
        return (1 << 30, 0)  # unknown layout: report "already parallel", no-op
    return (sum(max(1, math.ceil(sz / _SPLIT_BYTES)) for sz in files), sum(files))


def rebalance_scan(
    df: DataFrame,
    spark: SparkSession,
    sf_dir: str,
    name: str,
    per_task_bytes: int = 1 << 20,
) -> DataFrame:
    """Rebalance `df` (a projection/filter over test table `name`) when the
    underlying scan cannot parallelize on its own. Apply AFTER filters
    (pushdown stays at the scan) and BEFORE the heavy per-row work. No-op
    at cluster scale.

    The partition count is SIZE-DERIVED (compressed bytes / per_task_bytes,
    capped at the core count), not a flat core count: measured on the 11 MB
    lineitem fixture, a 32-way rebalance burned ~10 s of JVM CPU per run
    (GC + scheduler + 32x32 tiny shuffle blocks — guide §2.2's block-count
    quadratic in miniature) and made the bench SLOWER, while a handful of
    ~1 MB partitions keeps nearly all the parallel win at a fraction of the
    overhead. Callers whose per-row work is extreme relative to bytes
    (regex scrubbing over compressed text) pass a smaller per_task_bytes."""
    import math

    from pyspark.sql import functions as F

    splits, bytes_ = _natural_splits(sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    if splits >= cores or bytes_ < REBALANCE_MIN_BYTES:
        return df
    n = max(2, min(cores, math.ceil(bytes_ / per_task_bytes)))
    # hash-partition on a deterministic row digest rather than round-robin:
    # keyless repartition(n) pays a local sort of its input for retry
    # determinism (SPARK-23207), which costs more than the parallelism buys
    # at this size. The digest is xxhash64 over the row POSITION
    # (monotonically_increasing_id = scan partition id + in-partition row
    # index — deterministic under task retry because the same split replays
    # in the same order, unlike rand(); guide §2.5): position is unique by
    # construction, so the spread stays uniform even when the projected
    # columns are low-cardinality/heavy-tailed (a value-hash collocates
    # duplicate rows — ADVICE r13), and it avoids hashing wide text columns
    # just to pick a partition.
    return df.repartition(n, F.xxhash64(F.monotonically_increasing_id()))


def table_row_count(sf_dir: str, name: str) -> int | None:
    """Row count of a test table from its parquet FOOTER metadata — zero
    Spark jobs, no data scan; the row-count twin of table_disk_bytes (both
    are the local stand-in for catalog statistics). Used to SIZE sketches
    (d10's bloom capacity) where any upper bound on the item count works:
    at cluster scale this is one stats lookup instead of a count() job.
    None when the path cannot be read as parquet."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_rows
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
                for root, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            )
    except Exception:
        pass
    return None


def small_task_count(spark: SparkSession, sf_dir: str, name: str, per_task_bytes: int = 2 << 20) -> int:
    """Partition count for a PYTHON (Arrow) stage over a relation derived
    from test table `name`: sized by input bytes so a tiny input does not
    fan out to `cores` workers (each Arrow task pays worker spin-up +
    batch round-trip — measured 10 s of stage run time for 0.24 s of CPU
    on a 32-task mapInPandas over 5000 rows). Grows with the data and is
    capped at the session's core count. An UNKNOWN layout (remote paths
    os.path cannot stat) reports the full core count — assuming BIG is
    the safe direction, matching _natural_splits' conservative no-op."""
    import math

    _, bytes_ = _natural_splits(sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    if bytes_ == 0:
        return cores
    return max(1, min(cores, math.ceil(bytes_ / per_task_bytes)))


# Parquet SCHEMA cache — the metadata a catalog/metastore would hold.
# Every bare spark.read.parquet() call re-infers the schema from the file
# footer (~80 ms warm per call, measured r14); a 6-table star query paid
# ~0.5 s of pure schema re-inference per construction, twice per benched
# query. The cache keys on (path, mtime_ns, size) so a regenerated fixture
# re-infers, stores the session-independent StructType only (METADATA — no
# data, no results, nothing derived from query execution), and every read
# still scans the parquet itself. Directory layouts fall through to the
# plain inference path (a dir stat can't see content changes).
_SCHEMA_CACHE: dict = {}


def _read_parquet_cached(spark: SparkSession, path: str) -> DataFrame:
    if not os.path.isfile(path):
        return spark.read.parquet(path)
    try:
        st = os.stat(path)
    except OSError:
        return spark.read.parquet(path)
    key = (path, st.st_mtime_ns, st.st_size)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


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
    return _read_parquet_cached(spark, f"{sf_dir}/{name}.parquet")


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
    df = _read_parquet_cached(spark, f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.LongType):  # TIMESTAMP(NANOS)
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    else:  # TIMESTAMP(MICROS)/(MILLIS) — already a timestamp column
        ts = F.col("ts")
    return df.withColumn("ts", ts.cast("timestamp_ntz"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view (for the SQL API path)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
