"""Process-shared derived-table artifacts (the round-8 graph-artifact
pattern, factored): a relation that several queries consume is derived
ONCE per (session, fixture dir), written as an explicitly-partitioned
parquet layout, and read back by everyone — at 100 TB a shared derived
relation is a MAINTAINED TABLE (the B11 discipline), not a join or
projection you repeat per query.

Contract (shared by the co-purchase graph and the tokens artifacts):
- the cache key is owned by the CALLER (so tests can clear one family's
  cache without touching another's) and must include the Spark
  applicationId + the fixture dir, keeping synthetic tmp_path fixtures
  from ever seeing a stale artifact;
- the write uses an EXPLICIT partition count — an uncounted repartition
  is fair game for AQE's coalescePartitions, which would collapse a
  small-SF artifact to ONE file and serialize every downstream
  first-stage scan into one task (r7 verdict task 4);
- cache validity is the write's _SUCCESS marker PLUS the recorded
  part-file count: a reaper that takes data parts but leaves the marker
  (size-targeted cleanup, interrupted pass) would otherwise serve a
  truncated relation as a cache hit;
- a re-derivation removes the superseded directory before replacing the
  cache entry, and a failed write removes its own fresh directory — no
  orphaned trees accumulate under the scratch root;
- the scratch root comes from $SPARK_GRAFT_SCRATCH (executors write it,
  everyone reads it — the local-mode shared-filesystem assumption made
  explicit; point it at shared storage on a real cluster);
- artifact directories are removed at process exit.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_SCRATCH_ENV = "SPARK_GRAFT_SCRATCH"

# every cache dict handed to cached_parquet, for the atexit sweep
_ALL_CACHES: list[dict] = []
# path -> part-file count the write produced (validity cross-check; kept
# beside the cache so cache values stay plain paths, which tests rely on)
_EXPECTED_PARTS: dict[str, int] = {}


def _n_parts(path: str) -> int:
    try:
        return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    except OSError:
        return -1


def _valid(path: str) -> bool:
    if not os.path.isfile(os.path.join(path, "_SUCCESS")):
        return False
    expected = _EXPECTED_PARTS.get(path)
    return expected is None or _n_parts(path) == expected


def _scratch_root() -> str:
    root = os.environ.get(_SCRATCH_ENV) or tempfile.gettempdir()
    os.makedirs(root, exist_ok=True)
    return root


def _cleanup_artifacts() -> None:  # registered once below
    for cache in _ALL_CACHES:
        for p in cache.values():
            shutil.rmtree(os.path.dirname(p), ignore_errors=True)


atexit.register(_cleanup_artifacts)


def cached_parquet(
    spark: SparkSession,
    cache: dict,
    key: tuple,
    build,
    basename: str,
    partitions: int,
    partition_cols: tuple[str, ...] = (),
    counter: dict | None = None,
) -> DataFrame:
    """Serve `cache[key]` as a parquet-backed DataFrame, deriving it with
    `build()` (a zero-arg callable returning the relation) on the first
    request — or whenever the cached path lost its _SUCCESS marker.
    `counter["count"]` is incremented per real derivation (test pins).
    `partition_cols` keys the layout (node-keyed artifacts read back
    clustered); either way the partition COUNT is explicit."""
    if not any(c is cache for c in _ALL_CACHES):  # identity, not dict ==
        _ALL_CACHES.append(cache)
    path = cache.get(key)
    if path is None or not _valid(path):
        df = build().repartition(partitions, *partition_cols)
        new_dir = tempfile.mkdtemp(
            prefix=f"spark_graft_{basename}_", dir=_scratch_root()
        )
        new_path = os.path.join(new_dir, basename)
        try:
            df.write.parquet(new_path)
        except BaseException:
            shutil.rmtree(new_dir, ignore_errors=True)  # no orphan on failure
            raise
        # count only COMPLETED derivations (test pins count real work)
        if counter is not None:
            counter["count"] += 1
        _EXPECTED_PARTS[new_path] = _n_parts(new_path)
        if path is not None:  # superseded artifact: reclaim, don't orphan
            shutil.rmtree(os.path.dirname(path), ignore_errors=True)
            _EXPECTED_PARTS.pop(path, None)
        path = new_path
        cache[key] = path
    return spark.read.parquet(path)
