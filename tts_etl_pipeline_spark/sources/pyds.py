"""Custom Python DataSources (the Spark 4 `pyspark.sql.datasource` API) —
the "new source format" slot of the sources family (next to parquet
loaders, binaryFile media ingest and the streaming file source).

Two sources, both register()-able per session:

- ``jsonl_docs`` — a partition-parallel JSONL reader with REAL filter
  pushdown: one InputPartition per file (scales out with the file count),
  and EqualTo filters on declared string/int columns are accepted in
  pushFilters() and applied inside the source, so Spark's post-scan
  Filter disappears for them (the PushedFilters contract, reproduced in
  the Python source API).

- ``synthetic_events`` — a deterministic seeded event generator (batch
  AND micro-batch stream): the load/scale-testing source every engine
  needs. Partitions generate disjoint id ranges from a hash-seeded RNG,
  so output is reproducible at any parallelism; the stream reader pages
  through the same id space via integer offsets (initialOffset /
  latestOffset / read), giving an exactly-replayable stream.

Rows are yielded as tuples in schema order — the Arrow-batched path the
API documents; payload never touches the driver.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

JSONL_SCHEMA = "doc_id bigint, lang string, source string, text string"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonlReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.dir = options["path"]
        self.pushed: list = []

    def pushFilters(self, filters):
        # accept EqualTo on declared columns; everything else stays with
        # Spark (must return the SAME filter objects by reference)
        names = {f.name for f in self.schema.fields}
        rest = []
        for f in filters:
            if isinstance(f, EqualTo) and len(f.attribute) == 1 and f.attribute[0] in names:
                self.pushed.append((f.attribute[0], f.value))
            else:
                rest.append(f)
        return rest

    def partitions(self):
        files = sorted(
            fn for fn in os.listdir(self.dir) if fn.endswith(".jsonl")
        )
        return [_FilePartition(os.path.join(self.dir, fn)) for fn in files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        cols = [f.name for f in self.schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if any(rec.get(k) != v for k, v in self.pushed):
                    continue  # filter applied INSIDE the source
                yield tuple(rec.get(c) for c in cols)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, staged: str, rows: int):
        self.staged = staged
        self.rows = rows


def _stage_partition(staging_dir: str, iterator) -> _JsonlCommit:
    """Shared task-side half of both write protocols: stream the partition
    to a uniquely-named file under the OWNING JOB's
    `<target>/_staging/<job-uuid>/` subdirectory and hand the name back in
    the commit message. Staging is namespaced per writer instance (the
    uuid is minted driver-side in __init__ and rides the pickled writer to
    tasks) so two concurrent jobs writing the same target — e.g. a batch
    JsonlWriter alongside a JsonlStreamWriter — can never sweep each
    other's staged files mid-job. Task retries stage under fresh names;
    nothing a task does is ever visible to readers (JsonlReader lists only
    top-level `*.jsonl`, and Spark readers skip `_`-prefixed paths)."""
    import uuid

    os.makedirs(staging_dir, exist_ok=True)
    staged = os.path.join(staging_dir, f"{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(staged, "w", encoding="utf-8") as fh:
        for row in iterator:
            fh.write(json.dumps(row.asDict()) + "\n")
            n += 1
    return _JsonlCommit(staged, n)


# a sibling staging subdir untouched for this long is a crashed job's
# orphan — mirrors versioned.py vacuum's grace-period contract. The window
# that must be survived is STAGE-TO-COMMIT (a live job's last staged write
# until its driver-side commit publishes), not just the staging itself:
# a driver stalled longer than this between staging and commit() loses its
# staged files to a concurrent job's sweep, so size it generously.
_STAGING_ORPHAN_SECONDS = 6 * 3600.0


def _sweep_staging(target_dir: str, staging_dir: str) -> None:
    """Remove only the owning job's staging subdirectory, then age-gated
    orphans from crashed jobs (newest mtime inside the sibling subdir must
    be older than the grace window — a live job staging rows keeps its
    files fresh), and finally the `_staging` root once empty. Plain FILES
    directly under `_staging/` — the pre-namespacing layout's staged
    `*.jsonl` from an old crashed job — are age-gated on their own mtime
    and unlinked, so upgraded targets converge to a clean state instead of
    the legacy orphans blocking the root tidy-up forever."""
    import shutil
    import time

    shutil.rmtree(staging_dir, ignore_errors=True)
    root = os.path.join(target_dir, "_staging")
    try:
        now = time.time()
        for fn in os.listdir(root):
            sub = os.path.join(root, fn)
            try:
                newest = max(
                    [os.path.getmtime(sub)]
                    + [
                        os.path.getmtime(os.path.join(sub, f))
                        for f in os.listdir(sub)
                    ]
                )
                if now - newest >= _STAGING_ORPHAN_SECONDS:
                    shutil.rmtree(sub, ignore_errors=True)
            except NotADirectoryError:
                # legacy flat staged file (pre-namespacing layout)
                try:
                    if now - os.path.getmtime(sub) >= _STAGING_ORPHAN_SECONDS:
                        os.remove(sub)
                except FileNotFoundError:
                    pass
            except FileNotFoundError:
                continue
        os.rmdir(root)  # tidy: only succeeds once no job is staging
    except OSError:
        pass


class JsonlWriter(DataSourceWriter):
    """Batch write half of the custom-source API: tasks stage (above), and
    only the DRIVER's commit() publishes staged files under fresh
    uuid-unique `part-*.jsonl` names — append can therefore NEVER clobber
    an earlier write's files, and a failed job (abort()) just sweeps the
    staging dir. Honest atomicity contract on a plain directory:
    task-level writes are all-or-nothing and append publication is
    crash-safe (worst case: some parts published, no marker protocol —
    the batch API has no replay, so a failed job simply reruns), while
    OVERWRITE publishes the new files FIRST and deletes the old vintage
    last — a crash in between leaves both vintages visible, never
    neither. Full ACID overwrite is what sources/versioned.py's manifest
    tables are for; this source pins the DataSourceWriter protocol."""

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.dir = options["path"]
        self.overwrite = overwrite
        # per-job staging namespace (see _stage_partition)
        self.staging = os.path.join(self.dir, "_staging", uuid.uuid4().hex)

    def write(self, iterator) -> _JsonlCommit:
        return _stage_partition(self.staging, iterator)

    def commit(self, messages) -> None:
        import uuid

        os.makedirs(self.dir, exist_ok=True)
        old = (
            [f for f in os.listdir(self.dir) if f.endswith(".jsonl")]
            if self.overwrite
            else []
        )
        for m in messages:
            if m is not None:
                os.replace(
                    m.staged,
                    os.path.join(self.dir, f"part-{uuid.uuid4().hex}.jsonl"),
                )
        # overwrite: old vintage removed only AFTER the new one is visible
        for f in old:
            os.remove(os.path.join(self.dir, f))
        _sweep_staging(self.dir, self.staging)

    def abort(self, messages) -> None:
        _sweep_staging(self.dir, self.staging)


class JsonlStreamWriter(DataSourceStreamWriter):
    """STREAMING write half, EXACTLY-ONCE under replay via the st16
    manifest discipline done properly: each batch's parts publish under
    deterministic `batch-NNNNN-part-MMMMM.jsonl` names and a `_committed-`
    MARKER file (underscore-prefixed: invisible to Spark readers and to
    JsonlReader's *.jsonl listing) is written LAST — commit() probes the
    MARKER, not the part files, so a crash mid-publish (marker absent)
    makes the replay first remove the partial parts, then republish all
    of them, then plant the marker; a replay after a completed publish
    (marker present) discards its staged copies and changes nothing. An
    any-part-file probe would instead mistake a partial publish for a
    complete one and drop the missing partitions (review finding r7)."""

    def __init__(self, options: dict):
        import uuid

        self.dir = options["path"]
        # per-query staging namespace (see _stage_partition); a restarted
        # query mints a fresh uuid — the crashed run's subdir is reclaimed
        # by the age-gated orphan sweep
        self.staging = os.path.join(self.dir, "_staging", uuid.uuid4().hex)

    def write(self, iterator) -> _JsonlCommit:
        return _stage_partition(self.staging, iterator)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.dir, f"_committed-batch-{batch_id:05d}")

    def commit(self, messages, batchId: int) -> None:
        os.makedirs(self.dir, exist_ok=True)
        if os.path.exists(self._marker(batchId)):  # fully published before
            _sweep_staging(self.dir, self.staging)
            return
        # remove any partial parts from a crashed earlier publish
        prefix = f"batch-{batchId:05d}-"
        for f in os.listdir(self.dir):
            if f.startswith(prefix) and f.endswith(".jsonl"):
                os.remove(os.path.join(self.dir, f))
        for i, m in enumerate(messages):
            if m is not None:
                os.replace(
                    m.staged,
                    os.path.join(self.dir, f"{prefix}part-{i:05d}.jsonl"),
                )
        with open(self._marker(batchId), "w", encoding="utf-8") as fh:
            fh.write(str(len([m for m in messages if m is not None])))
        _sweep_staging(self.dir, self.staging)

    def abort(self, messages, batchId: int) -> None:
        # sweep this query's WHOLE staging subdir: failed/retried tasks'
        # staged files carry no commit message, so sweeping only
        # message-listed files would orphan them (micro-batches within one
        # query are sequential — safe; other jobs' subdirs are untouched)
        _sweep_staging(self.dir, self.staging)


class JsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_docs"

    def schema(self) -> str:
        return JSONL_SCHEMA

    def reader(self, schema: StructType) -> JsonlReader:
        return JsonlReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> JsonlStreamWriter:
        return JsonlStreamWriter(self.options)


# ---------------------------------------------------------------------------
# synthetic events
# ---------------------------------------------------------------------------
SYNTH_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"
_TYPES = ["view", "click", "purchase", "signup", "error"]


def _synth_row(i: int, seed: int) -> tuple:
    # splitmix64-style integer hash: deterministic, partition-independent
    z = (i + seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    z ^= z >> 31
    return (
        i,
        z % 1000,
        _TYPES[(z >> 10) % len(_TYPES)],
        round(((z >> 16) % 100000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SyntheticReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 4))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        # n_rows=0 -> step would be 0 and range(0, 0, 0) raises; mirror the
        # stream reader's max(1, ...) guard and return one empty partition
        # so an empty source yields an empty (not erroring) scan
        step = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(i, min(i + step, self.n_rows), self.seed)
            for i in range(0, self.n_rows, step)
        ] or [_RangePartition(0, 0, self.seed)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _synth_row(i, partition.seed)


class SyntheticStreamReader(DataSourceStreamReader):
    """Integer-offset micro-batch reader over the same deterministic id
    space: each TRIGGER advances the offset by one rows_per_batch page
    (latestOffset returns min(cursor + rows_per_batch, n_rows)), so a
    continuously-triggered run genuinely pages through the id space in
    multiple micro-batches; replayable because rows are pure functions of
    (id, seed).

    Trigger-mode note (verified empirically): availableNow SNAPSHOTS
    latestOffset once at query start, so under availableNow an incremental
    cursor yields exactly one rows_per_batch page per run. Callers wanting
    a full multi-batch drain run a processingTime trigger and stop when
    the committed offset reaches n_rows (operators/streaming_queries.st11
    does exactly that); callers wanting one-shot availableNow semantics
    set rows_per_batch >= n_rows.

    Restart contract: the paging cursor is IN-MEMORY, so a query restarted
    from a mid-stream checkpoint gets a fresh reader whose latestOffset
    would regress behind the committed offset — and a regressed offset
    log means re-emitted rows (silent duplicates). partitions() therefore
    RAISES when the committed start is ahead of the cursor: this synthetic
    source supports replay within a run and restart from a FRESH
    checkpoint (or the rows_per_batch >= n_rows one-shot mode, where the
    first latestOffset equals the committed offset and the restarted
    query terminates cleanly with no new batch)."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("n_rows", 1000))
        self.seed = int(options.get("seed", 42))
        self._cursor = 0  # driver-side paging cursor (one page per trigger)

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self._cursor = min(self._cursor + max(1, self.rows_per_batch), self.max_rows)
        return {"offset": self._cursor}

    def partitions(self, start: dict, end: dict):
        # the [start, end) range is a COMMITTED contract — truncating it
        # here would silently drop rows (the engine advances to `end`
        # regardless); batch-size control belongs in latestOffset. Large
        # ranges still split into rows_per_batch-sized partitions for
        # parallelism.
        lo, hi = start["offset"], min(end["offset"], self.max_rows)
        if lo > self._cursor:
            # mid-stream checkpoint restart: a fresh cursor would regress
            # latestOffset behind the committed offset and re-emit rows as
            # silent duplicates — fail loudly instead (see class docstring)
            raise ValueError(
                f"synthetic_events restarted from committed offset {lo} ahead "
                f"of its in-memory paging cursor ({self._cursor}); this source "
                f"supports fresh checkpoints or rows_per_batch >= n_rows only"
            )
        self._cursor = max(self._cursor, hi)
        step = max(1, self.rows_per_batch)
        return [
            _RangePartition(i, min(i + step, hi), self.seed)
            for i in range(lo, hi, step)
        ] or [_RangePartition(lo, lo, self.seed)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _synth_row(i, partition.seed)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema: StructType) -> SyntheticReader:
        return SyntheticReader(self.options)

    def streamReader(self, schema: StructType) -> SyntheticStreamReader:
        return SyntheticStreamReader(self.options)


def register_sources(spark) -> None:
    # pushFilters() requires the opt-in conf (runtime-settable); a reader
    # implementing it with the conf off is a hard AnalysisException
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonlDataSource)
    spark.dataSource.register(SyntheticEventsDataSource)
