"""Catalog-level multi-table transactions (sources/catalog.py).

The pins: one catalog commit makes a MULTI-table change visible
atomically (readers see the old version set or the new one, never a
mix); a transaction that died before its catalog commit left nothing
visible; conflicts are typed and scoped to the STAGED tables (disjoint
transactions interleave); catalog time travel serves consistent
historical version sets; pinned_versions reports the vacuum contract.
"""

import pytest

import tts_etl_pipeline_spark.sources.catalog as C
import tts_etl_pipeline_spark.sources.versioned as V


def _mk_tables(spark, tmp_path):
    cat = str(tmp_path / "cat")
    po = str(tmp_path / "orders_v")
    pl = str(tmp_path / "lines_v")
    V.write_version(spark.range(100).selectExpr("id AS k", "id AS v"), po)
    V.write_version(
        spark.range(300).selectExpr("id AS k", "id % 100 AS fk"), pl
    )
    txn = C.begin(cat)
    txn.stage("orders", 1, table_path=po)
    txn.stage("lines", 1, table_path=pl)
    assert txn.commit() == 1
    return cat, po, pl


def test_catalog_multi_table_atomicity(spark, tmp_path):
    cat, po, pl = _mk_tables(spark, tmp_path)
    assert C.read_catalog(spark, cat, "orders").count() == 100
    assert C.read_catalog(spark, cat, "lines").count() == 300
    # write BOTH tables: new table versions exist but catalog readers
    # see NEITHER until the one catalog commit
    v_o = V.write_version(
        spark.range(100, 120).selectExpr("id AS k", "id AS v"), po,
        mode="append",
    )
    v_l = V.write_version(
        spark.range(300, 360).selectExpr("id AS k", "id % 100 AS fk"), pl,
        mode="append",
    )
    assert C.read_catalog(spark, cat, "orders").count() == 100
    assert C.read_catalog(spark, cat, "lines").count() == 300
    txn = C.begin(cat)
    txn.stage("orders", v_o)
    txn.stage("lines", v_l)
    v_cat = txn.commit()
    assert v_cat == 2
    # both flip together
    assert C.read_catalog(spark, cat, "orders").count() == 120
    assert C.read_catalog(spark, cat, "lines").count() == 360
    # catalog time travel: the OLD consistent set stays servable
    assert C.read_catalog(spark, cat, "orders", version=1).count() == 100
    assert C.read_catalog(spark, cat, "lines", version=1).count() == 300
    snap = C.catalog_snapshot(cat)
    assert snap["orders"]["version"] == v_o
    assert snap["lines"]["version"] == v_l


def test_catalog_crash_leaves_nothing_visible(spark, tmp_path):
    """The crash contract: table commits WITHOUT a catalog commit are
    unreferenced table versions — invisible through the catalog, present
    via per-table time travel, reclaimable by table vacuum."""
    cat, po, _ = _mk_tables(spark, tmp_path)
    V.write_version(
        spark.range(100, 200).selectExpr("id AS k", "id AS v"), po,
        mode="append",
    )  # the transaction "dies" here: no stage/commit
    assert C.read_catalog(spark, cat, "orders").count() == 100
    assert V.read_version(spark, po).count() == 200  # table-level truth
    assert C.catalog_snapshot(cat)["orders"]["version"] == 1


def test_catalog_conflicts_scoped_to_staged_tables(spark, tmp_path):
    cat, po, pl = _mk_tables(spark, tmp_path)
    t1 = C.begin(cat)
    t2 = C.begin(cat)
    v_o = V.write_version(
        spark.range(100, 110).selectExpr("id AS k", "id AS v"), po,
        mode="append",
    )
    t2.stage("orders", v_o)
    assert t2.commit() == 2
    # t1 staging the SAME table: typed conflict (lost-update guard)
    t1.stage("orders", v_o)
    with pytest.raises(C.CatalogConflictError, match="re-pinned"):
        t1.commit()
    # a DISJOINT transaction begun before t2's commit sails through and
    # carries t2's orders pin forward untouched
    t3 = C.begin(cat)  # fresh begin is fine too, but test the stale one:
    t3.base = C.catalog_snapshot(cat, 1)  # as if begun at catalog v1
    t3.base_version = 1
    v_l = V.write_version(
        spark.range(300, 310).selectExpr("id AS k", "id % 100 AS fk"), pl,
        mode="append",
    )
    t3.stage("lines", v_l)
    assert t3.commit() == 3
    snap = C.catalog_snapshot(cat)
    assert snap["orders"]["version"] == v_o  # t2's pin rode through
    assert snap["lines"]["version"] == v_l


def test_catalog_stage_validation(spark, tmp_path):
    cat, po, _ = _mk_tables(spark, tmp_path)
    txn = C.begin(cat)
    with pytest.raises(ValueError, match="needs table_path"):
        txn.stage("ghost", 1)
    with pytest.raises(ValueError, match="registered at"):
        txn.stage("orders", 1, table_path=str(tmp_path / "elsewhere"))
    with pytest.raises(ValueError, match="does not exist"):
        txn.stage("orders", 99)
    with pytest.raises(ValueError, match="nothing staged"):
        C.begin(cat).commit()
    with pytest.raises(ValueError, match="does not exist"):
        C.catalog_snapshot(cat, 99)


def test_catalog_pinned_versions_and_vacuum_contract(spark, tmp_path):
    cat, po, pl = _mk_tables(spark, tmp_path)
    v_o = V.write_version(
        spark.range(100, 130).selectExpr("id AS k", "id AS v"), po,
        mode="append",
    )
    txn = C.begin(cat)
    txn.stage("orders", v_o)
    txn.commit()
    pins = C.pinned_versions(cat)
    assert pins == {"orders": [1, 2], "lines": [1]}
    # vacuum keeping both pinned versions: catalog time travel survives
    V.vacuum(po, keep_versions=2, grace_seconds=0.0)
    assert C.read_catalog(spark, cat, "orders", version=1).count() == 100
    assert C.read_catalog(spark, cat, "orders", version=2).count() == 130
