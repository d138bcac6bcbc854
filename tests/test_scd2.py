"""SCD2 fold semantics (sources/scd.py): open/close/no-op/insert arms,
null-safe attribute comparison, reserved names, duplicate-key refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.sources.scd import scd2_apply
from tts_etl_pipeline_spark.sources.versioned import read_version


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k int, state string, eff long")


def _hist(spark, path):
    rows = [
        (r["k"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in read_version(spark, path).collect()
    ]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def test_scd2_fold_arms_and_collapse(spark, tmp_path):
    path = str(tmp_path / "dim")
    scd2_apply(spark, path, _batch(spark, [(1, "A", 10), (2, "X", 10)]),
               "k", ["state"], "eff")
    # batch 2: k1 changes (close+open), k2 unchanged (no-op), k3 inserts
    scd2_apply(spark, path, _batch(spark, [(1, "B", 20), (2, "X", 20), (3, "C", 20)]),
               "k", ["state"], "eff")
    assert _hist(spark, path) == [
        (1, "A", 10, 20, False),
        (1, "B", 20, None, True),
        (2, "X", 10, None, True),   # consecutive duplicate collapsed
        (3, "C", 20, None, True),
    ]
    # batch 3: k1 flips back to A (a real new version, not a resurrection),
    # k3 absent (untouched)
    scd2_apply(spark, path, _batch(spark, [(1, "A", 30)]), "k", ["state"], "eff")
    assert _hist(spark, path) == [
        (1, "A", 10, 20, False),
        (1, "A", 30, None, True),
        (1, "B", 20, 30, False),
        (2, "X", 10, None, True),
        (3, "C", 20, None, True),
    ]


def test_scd2_null_safe_attrs_and_null_keys(spark, tmp_path):
    path = str(tmp_path / "dim")
    scd2_apply(spark, path, _batch(spark, [(1, None, 10)]), "k", ["state"], "eff")
    # NULL -> NULL is "same" (no new version); NULL -> value is a change
    scd2_apply(spark, path, _batch(spark, [(1, None, 20)]), "k", ["state"], "eff")
    assert _hist(spark, path) == [(1, None, 10, None, True)]
    scd2_apply(spark, path, _batch(spark, [(1, "A", 30)]), "k", ["state"], "eff")
    assert _hist(spark, path) == [
        (1, "A", 30, None, True),
        (1, None, 10, 30, False),  # None sorts last in the test key
    ]
    # a NULL-keyed change row never matches: it inserts (merge contract)
    scd2_apply(spark, path, _batch(spark, [(None, "Z", 40)]), "k", ["state"], "eff")
    assert (None, "Z", 40, None, True) in _hist(spark, path)


def test_scd2_guards(spark, tmp_path):
    path = str(tmp_path / "dim")
    with pytest.raises(ValueError, match="share key"):
        scd2_apply(spark, path, _batch(spark, [(1, "A", 10), (1, "B", 10)]),
                   "k", ["state"], "eff")
    with pytest.raises(ValueError, match="reserved"):
        scd2_apply(
            spark, path,
            spark.createDataFrame([(1, True, 10)], "k int, is_current boolean, eff long"),
            "k", ["is_current"], "eff",
        )
    with pytest.raises(ValueError, match="lacks columns"):
        scd2_apply(spark, path, _batch(spark, [(1, "A", 10)]), "k", ["other"], "eff")
    scd2_apply(spark, path, _batch(spark, [(1, "A", 10)]), "k", ["state"], "eff")
    with pytest.raises(ValueError, match="schema mismatch"):
        scd2_apply(
            spark, path,
            spark.createDataFrame([(1, 2, 20)], "k int, state int, eff long"),
            "k", ["state"], "eff",
        )


def test_scd2_conflict_when_head_moves(spark, tmp_path, monkeypatch):
    """An SCD2 fold computed against snapshot N must not clobber a commit
    that lands between its read and its write — the manifest CAS raises
    and the concurrent commit survives (the merge_upsert contract)."""
    import tts_etl_pipeline_spark.sources.scd as S
    import tts_etl_pipeline_spark.sources.versioned as V

    path = str(tmp_path / "dim")
    scd2_apply(spark, path, _batch(spark, [(1, "A", 10)]), "k", ["state"], "eff")

    real_parts = V.write_version_parts
    state = {"raced": False}

    def racing_parts(parts, p, reuse_files, expected_version, **kw):
        if not state["raced"]:
            state["raced"] = True
            V.write_version(
                spark.createDataFrame(
                    [(9, "Z", 10, None, True)],
                    "k int, state string, valid_from long, valid_to long,"
                    " is_current boolean",
                ),
                p,
                "append",
            )
        return real_parts(
            parts, p, reuse_files, expected_version=expected_version, **kw
        )

    monkeypatch.setattr(S, "write_version_parts", racing_parts)
    with pytest.raises(V.CommitConflictError):
        scd2_apply(spark, path, _batch(spark, [(1, "B", 20)]), "k", ["state"], "eff")
    # the concurrent append survived; the failed fold changed nothing
    assert (9, "Z", 10, None, True) in _hist(spark, path)
    assert (1, "A", 10, None, True) in _hist(spark, path)
    # retried fold on the fresh head applies cleanly over it
    monkeypatch.setattr(S, "write_version_parts", real_parts)
    scd2_apply(spark, path, _batch(spark, [(1, "B", 20)]), "k", ["state"], "eff")
    assert _hist(spark, path) == [
        (1, "A", 10, 20, False),
        (1, "B", 20, None, True),
        (9, "Z", 10, None, True),
    ]


def test_scd2_soft_delete_arm(spark, tmp_path):
    """Type-2 soft delete: a deleted key closes its current row at eff
    with NO replacement; deleting an absent or already-closed key is a
    no-op (replayed delete batches are idempotent); a key in both changes
    and deletes raises; NULL-keyed deletes match nothing."""
    path = str(tmp_path / "dim")
    scd2_apply(spark, path, _batch(spark, [(1, "A", 10), (2, "B", 10)]),
               "k", ["state"], "eff")

    def dels(rows):
        return spark.createDataFrame(rows, "k int, eff long")

    scd2_apply(spark, path, _batch(spark, [(3, "C", 20)]), "k", ["state"], "eff",
               deletes=dels([(2, 20), (77, 20), (None, 20)]))
    assert _hist(spark, path) == [
        (1, "A", 10, None, True),
        (2, "B", 10, 20, False),   # closed at eff, no replacement
        (3, "C", 20, None, True),
    ]
    # replayed delete: key 2 no longer current -> no-op, history unchanged
    before = _hist(spark, path)
    scd2_apply(spark, path, _batch(spark, []), "k", ["state"], "eff",
               deletes=dels([(2, 30)]))
    assert _hist(spark, path) == before
    with pytest.raises(ValueError, match="BOTH changes and deletes"):
        scd2_apply(spark, path, _batch(spark, [(1, "Z", 40)]),
                   "k", ["state"], "eff", deletes=dels([(1, 40)]))
    with pytest.raises(ValueError, match="delete batch lacks"):
        scd2_apply(spark, path, _batch(spark, []), "k", ["state"], "eff",
                   deletes=spark.createDataFrame([(1,)], "k int"))
    # a NULL eff would write a zombie row (valid_to NULL but not current,
    # or a NULL valid_from) — both input arms refuse
    with pytest.raises(ValueError, match="NULL 'eff'"):
        scd2_apply(spark, path, _batch(spark, [(5, "A", None)]),
                   "k", ["state"], "eff")
    with pytest.raises(ValueError, match="NULL 'eff'"):
        scd2_apply(spark, path, _batch(spark, []), "k", ["state"], "eff",
                   deletes=dels([(1, None)]))


def test_scd2_fold_reuses_closed_history_files(spark, tmp_path):
    """Round-10 contract: a fold carries closed-history data files BY
    MANIFEST REFERENCE — same names, byte-untouched on disk (inode + mtime
    identity, the test_rollup_maintenance immutability idiom) — and stages
    only O(current + batch) rows per fold, however much history has
    accumulated."""
    import os

    import pyarrow.parquet as pq

    from tts_etl_pipeline_spark.sources.scd import closed_history_files
    from tts_etl_pipeline_spark.sources.versioned import manifest

    path = str(tmp_path / "dim")
    keys = [1, 2, 3]
    staged_rows = []
    # every batch flips every key's state: history grows by 3 closures per
    # fold while the current slice stays 3 rows
    for i in range(12):
        batch = _batch(spark, [(k, f"s{i}", (i + 1) * 10) for k in keys])
        v = scd2_apply(spark, path, batch, "k", ["state"], "eff")
        if v >= 3:
            prev_files = set(manifest(path, v - 1)["files"])
            prev_closed = set(closed_history_files(path, v - 1))
            assert prev_closed, "closure files must classify from stats"
            m = manifest(path, v)
            # every previously-closed file rides through by reference
            assert prev_closed <= set(m["files"])
            staged_rows.append(
                sum(
                    pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                    for f in m["files"]
                    if f not in prev_files
                )
            )
    # O(current + batch): each fold stages 3 closures + 3 current rows,
    # never the accumulated history (33 closed rows by the last fold)
    assert staged_rows and all(n == 6 for n in staged_rows)
    head = 12
    closed = closed_history_files(path, head)
    before = {
        f: (os.stat(os.path.join(path, f)).st_ino,
            os.stat(os.path.join(path, f)).st_mtime_ns)
        for f in closed
    }
    scd2_apply(spark, path, _batch(spark, [(k, "zz", 999) for k in keys]),
               "k", ["state"], "eff")
    m = manifest(path, head + 1)
    for f, ident in before.items():
        assert f in m["files"]
        st = os.stat(os.path.join(path, f))
        assert (st.st_ino, st.st_mtime_ns) == ident, f
    # and the fold's answer is still the full correct history
    hist = _hist(spark, path)
    assert len(hist) == 3 * 13  # 12 closures + 1 open row per key
    assert sum(1 for r in hist if r[4]) == 3


def test_scd2_every_version_is_a_valid_scd2_state(spark, tmp_path):
    """Time travel x SCD2 composition (round-9 verdict task 7): reading the
    dimension AS OF any committed version yields a consistent history —
    valid_to IS NULL iff is_current, non-null valid_from, at most one open
    row per key, per-key closed spans non-negative and non-overlapping,
    and the open row starting at/after the last closure."""
    from tts_etl_pipeline_spark.sources.versioned import (
        current_version,
        read_version,
    )

    def dels(rows):
        return spark.createDataFrame(rows, "k int, eff long")

    path = str(tmp_path / "dim")
    scd2_apply(spark, path, _batch(spark, [(1, "A", 10), (2, "X", 10)]),
               "k", ["state"], "eff")
    scd2_apply(spark, path, _batch(spark, [(1, "B", 20), (3, "C", 20)]),
               "k", ["state"], "eff")
    scd2_apply(spark, path, _batch(spark, [(2, "Y", 30)]),
               "k", ["state"], "eff", deletes=dels([(3, 30)]))
    scd2_apply(spark, path, _batch(spark, [(3, "D", 40), (1, "B", 40)]),
               "k", ["state"], "eff")  # re-insert after soft delete + no-op
    for v in range(1, current_version(path) + 1):
        per_key: dict = {}
        for r in read_version(spark, path, v).collect():
            assert (r["valid_to"] is None) == r["is_current"], (v, r)
            assert r["valid_from"] is not None, (v, r)
            per_key.setdefault(r["k"], []).append(r)
        for k, rs in per_key.items():
            opens = [r for r in rs if r["is_current"]]
            assert len(opens) <= 1, (v, k)
            closed = sorted(
                (r for r in rs if not r["is_current"]),
                key=lambda r: r["valid_from"],
            )
            for r in closed:
                assert r["valid_from"] <= r["valid_to"], (v, r)
            for a, b in zip(closed, closed[1:]):
                assert a["valid_to"] <= b["valid_from"], (v, k)
            if opens and closed:
                assert opens[0]["valid_from"] >= closed[-1]["valid_to"], (v, k)


# ---------------------------------------------------------------------------
# Property: the distributed fold equals a pure-Python SCD2 reference model
# over random batch sequences (changes + deletes, monotone eff). Keys are
# non-null here (the NULL-key insert arm is pinned by the unit tests
# above); states include None to exercise the null-safe attr comparison.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def scd2_scenarios(draw):
    n_batches = draw(st.integers(1, 3))
    batches = []
    for i in range(n_batches):
        keys = draw(st.lists(st.integers(0, 4), unique=True, max_size=4))
        changes = [
            (k, draw(st.sampled_from(["a", "b", None])), (i + 1) * 10)
            for k in keys
        ]
        del_pool = [k for k in range(5) if k not in keys]
        dels = [
            (k, (i + 1) * 10)
            for k in draw(
                st.lists(st.sampled_from(del_pool), unique=True, max_size=2)
            )
        ] if del_pool else []
        # each fold independently clustered or not: interleavings exercise
        # the range-pruned reuse path against manifests written both ways
        cluster = draw(st.sampled_from([None, 1, 2, 3]))
        batches.append((changes, dels, cluster))
    return batches


def _model_fold(model, changes, deletes):
    for k, s, eff in changes:
        rows = model.setdefault(k, [])
        cur = next((r for r in rows if r[2] is None), None)
        if cur is None:
            rows.append([s, eff, None])
        elif cur[0] != s:  # python None == None -> "same", like eqNullSafe
            cur[2] = eff
            rows.append([s, eff, None])
    for k, eff in deletes:
        cur = next((r for r in model.get(k, []) if r[2] is None), None)
        if cur is not None:
            cur[2] = eff


@pytest.mark.filterwarnings(
    # py4j adjusts the recursion limit from its gateway thread; hypothesis
    # notices and (correctly) declines to reset it — benign here, and the
    # suite's zero-warning bar matters more than the notice
    "ignore:The recursion limit will not be reset:hypothesis.errors.HypothesisWarning"
)
@given(scd2_scenarios())
@settings(max_examples=8, deadline=None)
def test_scd2_fold_matches_reference_model(spark, tmp_path_factory, scenario):
    import shutil

    root = str(tmp_path_factory.mktemp("scd2_prop"))
    path = f"{root}/dim"
    model: dict = {}
    try:
        for changes, dels, cluster in scenario:
            scd2_apply(
                spark,
                path,
                spark.createDataFrame(changes, "k int, state string, eff long"),
                "k",
                ["state"],
                "eff",
                deletes=spark.createDataFrame(dels, "k int, eff long")
                if dels
                else None,
                cluster_files=cluster,
            )
            _model_fold(model, changes, dels)
        got = sorted(
            (
                (r["k"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
                for r in read_version(spark, path).collect()
            ),
            key=repr,
        )
        want = sorted(
            (
                (k, s, vf, vt, vt is None)
                for k, rows in model.items()
                for s, vf, vt in rows
            ),
            key=repr,
        )
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_scd2_validation_is_one_driver_action(spark, monkeypatch):
    """Round-9 verdict task 2 pinned structurally: ALL per-batch input-
    contract checks (dup keys per arm, NULL eff per arm, both-arms
    membership) are answered by ONE driver action — wall numbers at
    fixture scale are commit-dominated, so the contract is the action
    count, not the stopwatch. Both the clean pass and a violating batch
    must collect exactly once."""
    # patch the CONCRETE class: pyspark.sql.DataFrame is the abstract base
    # in Spark 4 and local sessions run the classic implementation
    from pyspark.sql.classic.dataframe import DataFrame

    from tts_etl_pipeline_spark.sources.scd import _validate_batch

    calls = {"n": 0}
    real = DataFrame.collect

    def counting(self):
        calls["n"] += 1
        return real(self)

    monkeypatch.setattr(DataFrame, "collect", counting)
    changes = _batch(spark, [(1, "A", 10), (2, "B", 10)])
    deletes = spark.createDataFrame([(3, 10), (None, 10)], "k int, eff long")
    _validate_batch(changes, "k", "eff", deletes)
    assert calls["n"] == 1, f"validation cost {calls['n']} actions"
    calls["n"] = 0
    with pytest.raises(ValueError, match="BOTH changes and deletes"):
        _validate_batch(changes, "k", "eff",
                        spark.createDataFrame([(1, 10)], "k int, eff long"))
    assert calls["n"] == 1, f"violating batch cost {calls['n']} actions"


def test_compact_closed_folds_closure_files_reuses_current(spark, tmp_path):
    """compact_closed (round-10): the closure groups the incremental fold
    accretes (one per fold) coalesce into one file while the CURRENT-slice
    files ride through by reference (inode+mtime identity — compact()'s
    full rewrite is exactly what this avoids); history is bit-identical,
    the change feed across the compaction is EMPTY, and the NEXT fold
    classifies the compacted file reusable again."""
    import os as _os

    from tts_etl_pipeline_spark.sources.scd import (
        closed_history_files,
        compact_closed,
    )
    from tts_etl_pipeline_spark.sources.versioned import (
        manifest,
        table_changes,
    )

    path = str(tmp_path / "dim")
    for i in range(8):
        scd2_apply(spark, path,
                   _batch(spark, [(k, f"s{i}", (i + 1) * 10) for k in (1, 2)]),
                   "k", ["state"], "eff")
    v = 8
    closed_before = closed_history_files(path, v)
    assert len(closed_before) >= 6  # one closure group per fold 2..8
    live_before = [
        f for f in manifest(path, v)["files"] if f not in set(closed_before)
    ]
    ident = {
        f: (_os.stat(_os.path.join(path, f)).st_ino,
            _os.stat(_os.path.join(path, f)).st_mtime_ns)
        for f in live_before
    }
    before = _hist(spark, path)
    v2 = compact_closed(spark, path)
    assert v2 == v + 1
    # current files reused verbatim, closure groups folded to one
    m2 = manifest(path, v2)
    for f, i_m in ident.items():
        st = _os.stat(_os.path.join(path, f))
        assert f in m2["files"] and (st.st_ino, st.st_mtime_ns) == i_m
    closed_after = closed_history_files(path, v2)
    assert len(closed_after) == 1
    assert _hist(spark, path) == before  # rows bit-identical
    assert table_changes(spark, path, v, v2).count() == 0  # empty feed
    # idempotence: already compact -> no new version
    assert compact_closed(spark, path) is None
    # and the next fold reuses the compacted file
    scd2_apply(spark, path, _batch(spark, [(1, "zz", 999)]), "k", ["state"], "eff")
    assert set(closed_after) <= set(manifest(path, v2 + 1)["files"])


def test_scd2_fold_after_everything_soft_deleted(spark, tmp_path):
    """The live-files-empty branch: soft-deleting EVERY key leaves a
    manifest of closed-only files (the empty current part is dropped at
    commit), so the next fold's live slice must come from the manifest
    SCHEMA alone — and an insert after total deletion must open cleanly
    while the closed history still rides through by reference."""
    from tts_etl_pipeline_spark.sources.scd import closed_history_files
    from tts_etl_pipeline_spark.sources.versioned import manifest

    def dels(rows):
        return spark.createDataFrame(rows, "k int, eff long")

    path = str(tmp_path / "dim")
    scd2_apply(spark, path, _batch(spark, [(1, "A", 10), (2, "B", 10)]),
               "k", ["state"], "eff")
    scd2_apply(spark, path, _batch(spark, []), "k", ["state"], "eff",
               deletes=dels([(1, 20), (2, 20)]))
    # every row closed; the manifest should classify ALL files closed
    m2 = manifest(path, 2)
    assert set(closed_history_files(path, 2)) == set(m2["files"])
    assert _hist(spark, path) == [
        (1, "A", 10, 20, False),
        (2, "B", 10, 20, False),
    ]
    # fold 3 takes the empty-live branch: insert a new key + re-insert 1
    scd2_apply(spark, path, _batch(spark, [(1, "A2", 30), (9, "Z", 30)]),
               "k", ["state"], "eff")
    assert _hist(spark, path) == [
        (1, "A", 10, 20, False),
        (1, "A2", 30, None, True),
        (2, "B", 10, 20, False),
        (9, "Z", 30, None, True),
    ]
    # ...and the closed files were carried by reference, not rewritten
    assert set(closed_history_files(path, 2)) <= set(manifest(path, 3)["files"])
    # deleting the re-inserted key again still round-trips
    scd2_apply(spark, path, _batch(spark, []), "k", ["state"], "eff",
               deletes=dels([(1, 40), (9, 40)]))
    hist = _hist(spark, path)
    assert all(not r[4] for r in hist) and len(hist) == 4


def test_scd2_fold_migrates_legacy_stats_free_table(spark, tmp_path):
    """Migration story for pre-r10 dimensions (no manifest is_current
    stats): the first fold classifies nothing as reusable, reads the
    whole table once, and re-splits it into stats-bearing closed/current
    file groups — from the second fold on, the table is fully
    incremental. Correct either way; this pins the one-time migration."""
    from tts_etl_pipeline_spark.sources.scd import closed_history_files
    from tts_etl_pipeline_spark.sources.versioned import manifest, write_version

    path = str(tmp_path / "dim")
    legacy = spark.createDataFrame(
        [(1, "A", 10, 20, False), (1, "B", 20, None, True),
         (2, "X", 10, None, True)],
        "k int, state string, valid_from long, valid_to long, is_current boolean",
    )
    write_version(legacy, path)  # r9-format commit: schema, NO stats
    assert closed_history_files(path, 1) == []  # nothing classifiable
    scd2_apply(spark, path, _batch(spark, [(2, "Y", 30)]), "k", ["state"], "eff")
    assert _hist(spark, path) == [
        (1, "A", 10, 20, False),
        (1, "B", 20, None, True),
        (2, "X", 10, 30, False),
        (2, "Y", 30, None, True),
    ]
    # the migration fold re-split: closed rows now live in classified files
    closed2 = closed_history_files(path, 2)
    assert closed2
    # ...and the NEXT fold is incremental: those files carried by reference
    scd2_apply(spark, path, _batch(spark, [(1, "C", 40)]), "k", ["state"], "eff")
    m3 = manifest(path, 3)
    assert set(closed2) <= set(m3["files"])
    assert _hist(spark, path) == [
        (1, "A", 10, 20, False),
        (1, "B", 20, 40, False),
        (1, "C", 40, None, True),
        (2, "X", 10, 30, False),
        (2, "Y", 30, None, True),
    ]


# ---------------------------------------------------------------------------
# Key-clustered folds (cluster_files): the round-10 "next rung" — a
# key-localized batch reads and rewrites only the current FILES whose key
# range it touches; everything else rides by manifest reference.
# ---------------------------------------------------------------------------


def _ident(path, f):
    import os as _os

    st = _os.stat(_os.path.join(path, f))
    return (st.st_ino, st.st_mtime_ns)


def test_scd2_clustered_fold_prunes_untouched_current_files(spark, tmp_path):
    """A localized batch (keys 1..20 of 1..100, clustered into 4 key-range
    files) must carry every current file whose range misses the batch BY
    REFERENCE (same name, inode+mtime identity) and stage exactly the
    touched files' rows + the closures — never the whole current slice."""
    import os as _os

    import pyarrow.parquet as pq

    from tts_etl_pipeline_spark.sources.versioned import manifest

    path = str(tmp_path / "dim")
    scd2_apply(spark, path,
               _batch(spark, [(k, "A", 10) for k in range(1, 101)]),
               "k", ["state"], "eff", cluster_files=4)
    m1 = manifest(path, 1)
    stats1 = m1["stats"]
    # clustering recorded per-file key ranges on all-current files
    assert all(
        stats1[f]["is_current"] == [True, True] and "k" in stats1[f]
        for f in m1["files"]
    )
    untouched = [f for f in m1["files"] if stats1[f]["k"][0] > 20]
    touched = [f for f in m1["files"] if stats1[f]["k"][0] <= 20]
    assert untouched and touched  # the fixture must exercise both arms
    ident_before = {f: _ident(path, f) for f in untouched}
    touched_rows = sum(
        pq.ParquetFile(_os.path.join(path, f)).metadata.num_rows
        for f in touched
        if stats1[f]["k"][1] >= 1  # every touched file intersects [1,20]
    )
    scd2_apply(spark, path,
               _batch(spark, [(k, "B", 20) for k in range(1, 21)]),
               "k", ["state"], "eff", cluster_files=4)
    m2 = manifest(path, 2)
    for f, ident in ident_before.items():
        assert f in set(m2["files"])  # carried by reference
        assert _ident(path, f) == ident  # byte-untouched on disk
    staged = sum(
        pq.ParquetFile(_os.path.join(path, f)).metadata.num_rows
        for f in m2["files"]
        if f not in set(m1["files"])
    )
    # closures (20) + the touched files' surviving current rows — the
    # untouched ~75 keys were never read, let alone rewritten
    assert staged == 20 + touched_rows
    assert staged < 100  # strictly less than the full current slice
    # and the answer is still the full correct history
    hist = _hist(spark, path)
    assert len(hist) == 120 and sum(1 for r in hist if r[4]) == 100


def test_scd2_clustered_fold_matches_plain_fold(spark, tmp_path):
    """Clustering is a LAYOUT choice, never a semantics one: the same batch
    sequence (changes, new keys, soft deletes) folded clustered and plain
    yields bag-identical history."""
    pa, pb = str(tmp_path / "clustered"), str(tmp_path / "plain")
    batches = [
        ([(k, "A", 10) for k in range(1, 41)], None),
        ([(k, "B", 20) for k in range(1, 11)] + [(99, "N", 20)], None),
        ([(k, "C", 30) for k in range(5, 9)], [(2, 30), (77, 30)]),
    ]
    for p, cf in ((pa, 3), (pb, None)):
        for rows, dels in batches:
            scd2_apply(
                spark, p, _batch(spark, rows), "k", ["state"], "eff",
                deletes=None if dels is None else spark.createDataFrame(
                    dels, "k int, eff long"),
                cluster_files=cf,
            )
    assert _hist(spark, pa) == _hist(spark, pb)


def test_scd2_clustered_null_keys_survive_pruning(spark, tmp_path):
    """A pruned current file may hold NULL-keyed rows (parquet min/max
    ignores nulls): skipping it must keep them current — which is sound
    because NO batch can ever match or delete a NULL key."""
    path = str(tmp_path / "dim")
    scd2_apply(spark, path,
               _batch(spark, [(None, "Z", 10), (1, "A", 10), (2, "A", 10),
                              (50, "A", 10), (60, "A", 10)]),
               "k", ["state"], "eff", cluster_files=2)
    # localized batch on the HIGH keys: the low file (NULLs sort first, so
    # it holds the NULL row) is untouched
    scd2_apply(spark, path, _batch(spark, [(50, "B", 20)]),
               "k", ["state"], "eff", cluster_files=2)
    assert _hist(spark, path) == [
        (1, "A", 10, None, True),
        (2, "A", 10, None, True),
        (50, "A", 10, 20, False),
        (50, "B", 20, None, True),
        (60, "A", 10, None, True),
        (None, "Z", 10, None, True),
    ]
    # ...and a later LOW-key batch reads that file and folds it correctly
    scd2_apply(spark, path, _batch(spark, [(1, "C", 30)]),
               "k", ["state"], "eff", cluster_files=2)
    hist = _hist(spark, path)
    assert (1, "C", 30, None, True) in hist
    assert (None, "Z", 10, None, True) in hist


def test_recluster_current_restores_pruning_empty_changefeed(spark, tmp_path):
    """recluster_current: bit-identical rows (EMPTY change feed across the
    commit), closed-only files reused untouched, and the re-clustered
    current slice prunes again on the next localized fold."""
    from tts_etl_pipeline_spark.sources.scd import (
        closed_history_files,
        recluster_current,
    )
    from tts_etl_pipeline_spark.sources.versioned import manifest, table_changes

    path = str(tmp_path / "dim")
    scd2_apply(spark, path,
               _batch(spark, [(k, "A", 10) for k in range(1, 41)]),
               "k", ["state"], "eff", cluster_files=4)
    # a WIDE batch (keys at both ends) makes the fold's fresh current files
    # span the whole key range — clustering has degraded
    scd2_apply(spark, path, _batch(spark, [(1, "B", 20), (40, "B", 20)]),
               "k", ["state"], "eff", cluster_files=1)
    before = _hist(spark, path)
    closed = closed_history_files(path, 2)
    ident = {f: _ident(path, f) for f in closed}
    v = recluster_current(spark, path, "k", target_files=4)
    assert v == 3
    assert _hist(spark, path) == before  # rows bit-identical
    assert table_changes(spark, path, 2, v).count() == 0  # empty feed
    for f, i in ident.items():  # closed history rode through by reference
        assert f in set(manifest(path, v)["files"]) and _ident(path, f) == i
    # pruning works again: a low-key batch reuses the high-range files
    m3 = manifest(path, v)
    high = [
        f for f in m3["files"]
        if m3["stats"].get(f, {}).get("is_current") == [True, True]
        and m3["stats"][f].get("k", [0, 0])[0] > 5
    ]
    assert high
    scd2_apply(spark, path, _batch(spark, [(1, "C", 30)]),
               "k", ["state"], "eff", cluster_files=4)
    m4 = manifest(path, 4)
    assert set(high) <= set(m4["files"])
    # recluster on an empty/uncommitted table is a no-op
    assert recluster_current(spark, str(tmp_path / "nope"), "k") is None


def test_scd2_cluster_files_validation_and_string_keys(spark, tmp_path):
    """cluster_files < 1 raises; a STRING key now records truncate(16)
    BOUNDS (round-11 string-stats support), so string-keyed clustered
    folds get the same range-pruned file reuse as numeric keys — and the
    fold result stays exact either way."""
    from tts_etl_pipeline_spark.sources.versioned import manifest

    with pytest.raises(ValueError, match="cluster_files"):
        scd2_apply(spark, str(tmp_path / "x"),
                   _batch(spark, [(1, "A", 10)]), "k", ["state"], "eff",
                   cluster_files=0)
    path = str(tmp_path / "sdim")
    sb = lambda rows: spark.createDataFrame(rows, "k string, state string, eff long")  # noqa: E731
    scd2_apply(spark, path, sb([("a", "A", 10), ("b", "A", 10)]),
               "k", ["state"], "eff", cluster_files=2)
    m1 = manifest(path, 1)
    assert any("k" in m1["stats"].get(f, {}) for f in m1["files"])
    scd2_apply(spark, path, sb([("a", "B", 20)]),
               "k", ["state"], "eff", cluster_files=2)
    rows = sorted(
        (r["k"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in read_version(spark, path).collect()
    )
    assert rows == [
        ("a", "A", 10, 20, False),
        ("a", "B", 20, None, True),
        ("b", "A", 10, None, True),
    ]


def test_clone_of_clustered_dim_keeps_pruning_and_lineage(spark, tmp_path):
    """Composition: clone_table of a key-clustered dimension carries the
    key-range stats verbatim, so a localized fold on the CLONE still
    prunes (reuses the clone's hardlinked untouched files) — and the
    SOURCE table is untouched by the clone's folds (independent lineage,
    shared immutable inodes)."""
    from tts_etl_pipeline_spark.sources.versioned import (
        clone_table,
        current_version,
        manifest,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    scd2_apply(spark, src,
               _batch(spark, [(k, "A", 10) for k in range(1, 41)]),
               "k", ["state"], "eff", cluster_files=4)
    assert clone_table(src, dst) == 1
    m1 = manifest(dst, 1)
    high = [
        f for f in m1["files"]
        if m1["stats"].get(f, {}).get("k", [0, 0])[0] > 10
    ]
    assert high  # ranges carried over
    ident = {f: _ident(dst, f) for f in high}
    scd2_apply(spark, dst, _batch(spark, [(1, "B", 20)]),
               "k", ["state"], "eff", cluster_files=4)
    m2 = manifest(dst, 2)
    for f, i in ident.items():
        assert f in set(m2["files"]) and _ident(dst, f) == i
    # source lineage untouched by the clone's fold
    assert current_version(src) == 1
    src_hist = _hist(spark, src)
    assert all(r[4] for r in src_hist) and len(src_hist) == 40
    dst_hist = _hist(spark, dst)
    assert (1, "B", 20, None, True) in dst_hist and len(dst_hist) == 41


def test_scd2_fold_survives_column_rename(spark, tmp_path):
    """Renaming an SCD2 attribute (metadata-only, stable physicals) must
    not break the incremental machinery: the next fold speaks the new
    name, closed-file classification and key-range pruning still work
    (stats are physical-keyed)."""
    from tts_etl_pipeline_spark.sources.versioned import (
        manifest,
        rename_column,
    )

    path = str(tmp_path / "dim")
    scd2_apply(spark, path,
               _batch(spark, [(k, "A", 10) for k in range(1, 41)]),
               "k", ["state"], "eff", cluster_files=4)
    rename_column(path, "state", "st")
    v = scd2_apply(
        spark, path,
        spark.createDataFrame([(1, "B", 20)], "k int, st string, eff long"),
        "k", ["st"], "eff", cluster_files=4)
    assert v == 3
    rows = sorted(
        (r["k"], r["st"], r["is_current"])
        for r in read_version(spark, path).collect()
        if r["k"] in (1, 2)
    )
    assert rows == [(1, "A", False), (1, "B", True), (2, "A", True)]
    # key-range pruning still classified the untouched range files
    m2, m3 = manifest(path, 2), manifest(path, 3)
    assert len([f for f in m2["files"] if f in set(m3["files"])]) >= 3
