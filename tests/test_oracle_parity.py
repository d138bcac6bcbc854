"""Driver-gate mimic: every queries() entry with an oracle must match DuckDB
exactly (row count + schema + cell values) at the test scale factor."""

from __future__ import annotations

import pytest

from tests.oracle_harness import compare, duckdb_connection
from tts_etl_pipeline_spark.registry import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    oracle = duck.execute(ORACLES[name]).fetchdf()
    errs = compare(df, oracle, name)
    assert not errs, "\n".join(errs)
