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
    # collect(), not count(): count() prunes the projection, which once hid
    # an ANSI DIVIDE_BY_ZERO inside an unevaluated column (x8's jaccard).
    # The driver's hash comparison evaluates every column — so must this.
    rows = all_queries()[name](spark, empty_sf).collect()
    assert len(rows) >= 0


def test_queries_survive_all_null_text_columns(spark, sf_dir, tmp_path):
    """Second adversarial vintage: every nullable text-ish column is 100%
    NULL (documents.text/lang/source, events.props/event_type,
    customer.c_mktsegment). All oracle-backed queries must still run —
    the coalesce()/null-semantics discipline, exercised corpus-wide."""
    nullable = {
        "documents": ["text", "lang", "source"],
        "events": ["props", "event_type"],
        "customer": ["c_mktsegment"],
    }
    root = tmp_path / "null_sf"
    root.mkdir()
    for t in TABLE_NAMES:
        tbl = pq.read_table(f"{sf_dir}/{t}.parquet")
        for col in nullable.get(t, []):
            i = tbl.schema.get_field_index(col)
            tbl = tbl.set_column(
                i, col, pa.nulls(len(tbl), type=tbl.schema.field(col).type)
            )
        pq.write_table(tbl, str(root / f"{t}.parquet"))
    qs = all_queries()
    for name in sorted(all_oracles()):
        # collect() for the same reason as the empty sweep: every column
        # must actually evaluate under the all-NULL vintage.
        assert len(qs[name](spark, str(root)).collect()) >= 0, name
