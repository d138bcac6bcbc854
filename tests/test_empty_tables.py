"""Robustness sweep: every oracle-backed query must RUN (zero rows is a
fine answer, an exception is not) against fully EMPTY copies of all ten
tables — the situation any real pipeline hits on an empty partition, a
fresh tenant, or a filtered-to-nothing date range.

The approximate/ML queries (rows-only set) are exempt: KMeans/LSH/graph
builds legitimately require a non-empty corpus, and their registry entries
document that contract.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tts_etl_pipeline_spark.registry import all_oracles, all_queries
from tts_etl_pipeline_spark.sources.tables import TABLE_NAMES


@pytest.fixture(scope="module")
def empty_sf(sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLE_NAMES:
        s = pq.read_schema(f"{sf_dir}/{t}.parquet")
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in s}),
            str(root / f"{t}.parquet"),
        )
    return str(root)


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_query_survives_empty_tables(spark, empty_sf, name):
    n = all_queries()[name](spark, empty_sf).count()
    assert n >= 0
