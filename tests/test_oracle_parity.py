"""Driver-gate mimic: every queries() entry with an oracle must match DuckDB
exactly (row count + schema + cell values) at the test scale factor.

Piggybacked on the same DataFrame construction: the SCAN-COUNT sweep. Every
query's physical plan is checked against a per-table scan allowance
(default 1 — the single-scan discipline of PLANS.md). The only queries
allowed >1 scan of a table are the documented shapes where re-scanning IS
the scale-correct plan (see PLANS.md "Multi-scan sweep"): disjoint row
slices with different pushed filters, a 25-row dimension in two join roles,
or a broadcast scalar-subquery second scan. Any new query that accidentally
re-derives a fact table fails here before it ever ships.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_connection
from tts_etl_pipeline_spark.plans.inspect import scans_by_table
from tts_etl_pipeline_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()

# (query, table) -> allowed parquet scans; everything else defaults to 1.
# Keep in sync with PLANS.md "Multi-scan sweep" — each entry is a deliberate
# scale decision, not an exemption of convenience.
SCAN_ALLOWANCE = {
    ("q2_min_balance_supplier", "supplier"): 2,   # broadcast scalar subquery
    ("q22_global_sales_opportunity", "customer"): 2,  # broadcast scalar subquery
    ("q7_volume_shipping", "nation"): 2,          # 25-row dim, two join roles
    ("q8_market_share", "nation"): 2,             # 25-row dim, two join roles
    ("s4_full_outer_reconcile", "orders"): 2,     # disjoint date slices
    ("v1_topk_cosine_exact", "embeddings"): 2,    # 5-row query side vs corpus
    ("v2_embedding_neardup_pairs", "embeddings"): 2,
    ("v4_lsh_ann_topk", "embeddings"): 2,
    ("dq1_referential_integrity", "orders"): 2,   # child AND parent role
    ("dq1_referential_integrity", "customer"): 2,
    ("dq2_column_profile", "orders"): 2,          # exact-distinct second pass
    ("v7_filtered_ann_topk", "embeddings"): 2,    # 5-row query side vs corpus
    ("v8_knn_graph_exact", "embeddings"): 2,      # label-blocked self-join sides
    ("h5_seasonal_backtest", "events"): 2,        # disjoint train/test slices
    # ("name", "*") is a wildcard over table names, for queries whose scanned
    # relations are per-run temp artifacts with uuid file names. Currently
    # empty: st13 materializes each CDF batch on delivery (the foreachBatch
    # shape), so its final plan scans no parquet at all.
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    for tbl, n in scans_by_table(df).items():
        allowed = SCAN_ALLOWANCE.get(
            (name, tbl), SCAN_ALLOWANCE.get((name, "*"), 1)
        )
        assert n <= allowed, (
            f"{name} scans {tbl} {n}x (allowed {allowed}): either materialize "
            "the shared intermediate or document the exception in PLANS.md "
            "and SCAN_ALLOWANCE"
        )
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    oracle = duck.execute(ORACLES[name]).fetchdf()
    errs = compare(df, oracle, name)
    assert not errs, "\n".join(errs)
