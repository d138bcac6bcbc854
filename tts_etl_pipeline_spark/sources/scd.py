"""Type-2 slowly-changing-dimension maintenance on the versioned table —
the warehouse pattern for "keep every historical value of a dimension
row" (Kimball SCD type 2), composed from primitives this engine already
has: one full-outer join per change batch (the merge_upsert shape) and an
atomic manifest commit (sources/versioned.py), so readers see either the
old history or the new one, never a torn mix.

History schema: <key>, <attrs...>, valid_from, valid_to, is_current —
validity bounds are bigint epoch-micros (exact integer arithmetic both in
Spark and in any SQL oracle), `valid_to IS NULL` iff `is_current`.

Fold semantics per change batch (key, attrs..., eff):
- key matched, any attr differs (NULL-SAFE comparison — NULL->NULL is
  "same", NULL->value is a change): the current row CLOSES
  (valid_to = eff) and a new current row opens (valid_from = eff);
- key matched, all attrs equal: no-op (consecutive duplicates collapse —
  re-delivering an unchanged state never forks a version);
- key only in the batch (including NULL keys, the merge_upsert contract):
  a new current row opens;
- key only in the dimension: untouched;
- key in the optional `deletes` relation (key, eff): the current row
  CLOSES at eff with NO replacement — the Kimball type-2 soft delete
  (the entity left the source; its history stays queryable). Deleting an
  absent or already-closed key is a no-op, which is what makes a
  re-delivered delete batch idempotent; a key in BOTH changes and
  deletes of one batch raises (no well-defined order); NULL-keyed
  deletes match nothing and are dropped.
Closed history rows pass through every fold unchanged — at 100 TB the
join is current-rows x batch, never history x batch.

Contract the caller owes (documented, not enforced): batches apply in
non-decreasing `eff` order per key — this is a fold over a change STREAM,
and an out-of-order batch would write a negative validity span, exactly
as it would in any warehouse SCD pipeline. Duplicate non-null keys within
one batch raise (two states for one key in one batch has no well-defined
order). The snapshot is conflict-checked: a concurrent commit surfaces as
CommitConflictError, never a silent overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.versioned import (
    current_version,
    read_version,
    write_version,
)

RESERVED = ("valid_from", "valid_to", "is_current")


def scd2_apply(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    attrs: list[str],
    eff_col: str,
    deletes: DataFrame | None = None,
) -> int:
    """Fold one change batch into the SCD2 dimension at `path`; returns
    the committed version. `changes` columns: key, attrs..., eff_col
    (castable to bigint epoch-micros); optional `deletes` columns: key,
    eff_col — soft-deleted keys close their current row at eff."""
    for r in RESERVED:
        if r in (key, *attrs) or r == eff_col:
            raise ValueError(f"column name {r!r} is reserved by SCD2 history")
    if eff_col in (key, *attrs):
        raise ValueError(f"eff_col {eff_col!r} collides with key/attrs")
    missing = [c for c in (key, *attrs, eff_col) if c not in changes.columns]
    if missing:
        raise ValueError(f"change batch lacks columns {missing}")
    dup = (
        changes.filter(F.col(key).isNotNull())
        .groupBy(key)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(f"multiple change rows share key {dup[0][key]!r}")
    # a NULL eff would write a row violating the 'valid_to IS NULL iff
    # is_current' / non-null valid_from invariants — refuse like every
    # other input-contract violation here
    if changes.filter(F.col(eff_col).isNull()).limit(1).collect():
        raise ValueError(f"change batch has a NULL {eff_col!r}")
    d = None
    if deletes is not None:
        missing_d = [c for c in (key, eff_col) if c not in deletes.columns]
        if missing_d:
            raise ValueError(f"delete batch lacks columns {missing_d}")
        ddup = (
            deletes.filter(F.col(key).isNotNull())
            .groupBy(key)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if ddup:
            raise ValueError(f"multiple delete rows share key {ddup[0][key]!r}")
        if deletes.filter(F.col(eff_col).isNull()).limit(1).collect():
            raise ValueError(f"delete batch has a NULL {eff_col!r}")
        both = changes.select(key).join(deletes.select(key), key).limit(1).collect()
        if both:
            raise ValueError(
                f"key {both[0][key]!r} appears in BOTH changes and deletes "
                "of one batch — no well-defined order"
            )
        # NULL-keyed deletes can never match a current row
        d = deletes.filter(F.col(key).isNotNull()).select(
            F.col(key).alias("__d_key"),
            F.col(eff_col).cast("long").alias("__d_eff"),
        )

    cols = [key, *attrs]
    fresh = changes.select(
        *cols,
        F.col(eff_col).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    base_version = current_version(path)
    if base_version == 0:  # first batch: every change row opens a version
        return write_version(fresh, path, mode="append", expected_version=0)

    hist = read_version(spark, path, base_version)
    c_types = {f.name: f.dataType for f in hist.schema.fields if f.name in cols}
    f_types = {f.name: f.dataType for f in fresh.schema.fields if f.name in cols}
    if c_types != f_types:
        raise ValueError(
            f"SCD2 schema mismatch: dimension {sorted(c_types.items(), key=str)}"
            f" vs batch {sorted(f_types.items(), key=str)}"
        )
    closed = hist.filter(~F.col("is_current"))
    current = hist.filter(F.col("is_current"))
    t = current.select(
        *[F.col(c).alias(f"__t_{c}") for c in cols],
        F.col("valid_from").alias("__t_from"),
        F.lit(True).alias("__t_exists"),
    )
    s = fresh.select(
        *[F.col(c).alias(f"__s_{c}") for c in cols],
        F.col("valid_from").alias("__s_eff"),
        F.lit(True).alias("__s_exists"),
    )
    from tts_etl_pipeline_spark.functions.checkpoints import materialize

    # materialized once: three filtered passes below would otherwise each
    # recompute the full-outer join (and re-scan the snapshot under it)
    joined = materialize(
        t.join(s, t[f"__t_{key}"] == s[f"__s_{key}"], "full_outer")
    )
    matched = F.col("__t_exists").isNotNull() & F.col("__s_exists").isNotNull()
    differs = F.lit(False)
    for a in attrs:  # null-safe: NULL->NULL is "same", NULL->value changes
        differs = differs | ~F.col(f"__t_{a}").eqNullSafe(F.col(f"__s_{a}"))
    # one joined row can emit TWO history rows (the closure + the new
    # current); the join is current-x-batch sized, so three filtered
    # passes over it are dimension-cheap
    closures = joined.filter(matched & differs).select(
        *[F.col(f"__t_{c}").alias(c) for c in cols],
        F.col("__t_from").alias("valid_from"),
        F.col("__s_eff").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = joined.filter(
        (matched & differs) | (~matched & F.col("__s_exists").isNotNull())
    ).select(
        *[F.col(f"__s_{c}").alias(c) for c in cols],
        F.col("__s_eff").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    kept = joined.filter(
        F.col("__t_exists").isNotNull() & (~matched | ~differs)
    ).select(
        *[F.col(f"__t_{c}").alias(c) for c in cols],
        F.col("__t_from").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    if d is not None:
        # soft-delete pass over the SURVIVING current rows (t-only and
        # matched-unchanged — a newly-opened key cannot be deleted in the
        # same batch, enforced above): a matched delete closes the row at
        # its eff, everything else stays current. One left join; the
        # no-match NULL is exactly the open row's valid_to.
        kept = kept.join(d, kept[key] == d["__d_key"], "left").select(
            *cols,
            "valid_from",
            F.col("__d_eff").alias("valid_to"),
            F.col("__d_key").isNull().alias("is_current"),
        )
    nxt = closed.unionByName(closures).unionByName(kept).unionByName(opened)
    return write_version(
        nxt.select(*hist.columns), path, mode="overwrite",
        expected_version=base_version,
    )
