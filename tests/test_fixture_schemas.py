"""Fixture-schema canary (VERDICT r03 item 6).

The driver regenerates /root/testdata between rounds; round 3 silently moved
events.ts from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and broke 17
queries at driver time. This test pins the dtypes every operator assumes —
after the schema-adaptive loaders normalize them — so the next silent fixture
regeneration fails HERE with a readable message instead.
"""

import pytest
from pyspark.sql import types as T

from tts_etl_pipeline_spark.sources.tables import TABLE_NAMES, table

# Post-loader contract: the exact name->type mapping every operator codes
# against today (pinned from the current fixtures, 2026-08-13 vintage).
EXPECTED = {
    "region": {
        "r_regionkey": T.IntegerType(),
        "r_name": T.StringType(),
    },
    "nation": {
        "n_nationkey": T.IntegerType(),
        "n_name": T.StringType(),
        "n_regionkey": T.IntegerType(),
    },
    "customer": {
        "c_custkey": T.LongType(),
        "c_name": T.StringType(),
        "c_nationkey": T.IntegerType(),
        "c_acctbal": T.DoubleType(),
        "c_mktsegment": T.StringType(),
    },
    "supplier": {
        "s_suppkey": T.LongType(),
        "s_name": T.StringType(),
        "s_nationkey": T.IntegerType(),
        "s_acctbal": T.DoubleType(),
    },
    "part": {
        "p_partkey": T.LongType(),
        "p_name": T.StringType(),
        "p_brand": T.StringType(),
        "p_type": T.StringType(),
        "p_size": T.IntegerType(),
        "p_retailprice": T.DoubleType(),
    },
    "orders": {
        "o_orderkey": T.LongType(),
        "o_custkey": T.LongType(),
        "o_orderstatus": T.StringType(),
        "o_totalprice": T.DoubleType(),
        "o_orderdate": T.TimestampNTZType(),
        "o_orderpriority": T.StringType(),
    },
    "lineitem": {
        "l_orderkey": T.LongType(),
        "l_partkey": T.LongType(),
        "l_suppkey": T.LongType(),
        "l_linenumber": T.IntegerType(),
        "l_quantity": T.DoubleType(),
        "l_extendedprice": T.DoubleType(),
        "l_discount": T.DoubleType(),
        "l_tax": T.DoubleType(),
        "l_returnflag": T.StringType(),
        "l_linestatus": T.StringType(),
        "l_shipdate": T.TimestampNTZType(),
    },
    "events": {
        "event_id": T.LongType(),
        "ts": T.TimestampNTZType(),  # loader normalizes nanos/micros here
        "user_id": T.LongType(),
        "event_type": T.StringType(),
        "value": T.DoubleType(),
        "props": T.StringType(),
    },
    "documents": {
        "doc_id": T.LongType(),
        "text": T.StringType(),
        "lang": T.StringType(),
        "source": T.StringType(),
        "n_chars": T.LongType(),
    },
    "embeddings": {
        "vec_id": T.LongType(),
        "embedding": T.ArrayType(T.FloatType(), True),
        "label": T.IntegerType(),
    },
}


@pytest.mark.parametrize("name", TABLE_NAMES)
def test_fixture_schema_contract(spark, sf_dir, name):
    df = table(spark, sf_dir, name)
    actual = {f.name: f.dataType for f in df.schema.fields}
    want = EXPECTED[name]
    assert set(actual) == set(want), (
        f"fixture drift: {name} columns changed — driver regenerated the "
        f"fixture with a new schema. Now: {sorted(actual)}, operators assume "
        f"{sorted(want)}."
    )
    for col, want_type in want.items():
        assert actual[col] == want_type, (
            f"fixture drift: {name}.{col} is {actual[col]}, operators assume "
            f"{want_type}. If the parquet vintage changed, adapt the loader "
            f"in sources/tables.py (see _events for the pattern)."
        )


def test_events_loader_is_schema_adaptive(spark, sf_dir, tmp_path):
    """Both parquet vintages must load to identical TIMESTAMP_NTZ values:
    write a nanos-style int64 copy of a few rows and check it round-trips to
    the same wall times as the native read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    native = table(spark, sf_dir, "events")
    head = native.orderBy("event_id").limit(5).collect()

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by("event_id").slice(0, 5)
    ts_ns = tbl.column("ts").cast(pa.timestamp("ns")).cast(pa.int64())
    nanos_tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts_ns)
    nanos_dir = tmp_path / "nanos_fixture"
    nanos_dir.mkdir()
    pq.write_table(nanos_tbl, str(nanos_dir / "events.parquet"))

    # int64 column named ts == what nanosAsLong produces for TIMESTAMP(NANOS)
    replay = table(spark, str(nanos_dir), "events").orderBy("event_id").collect()
    assert [r["ts"] for r in replay] == [r["ts"] for r in head]
    assert [r["event_id"] for r in replay] == [r["event_id"] for r in head]
