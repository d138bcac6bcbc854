"""Relational core (SURVEY.md §2.2-B7): scans, filters, projections, joins,
aggregations, windows, sorts/limits, set ops over the TPC-H-ish star schema.

The reference implements none of these (SURVEY.md §2.3) — their semantics are
ANSI SQL, verified per-query against DuckDB oracles. Every builder returns a
lazy DataFrame; Catalyst handles pushdown/pruning/join strategy. Small
dimensions are explicitly broadcast so the plan at 100 TB keeps the fact-table
scan shuffle-free wherever possible.

Each query has a matching entry in ORACLES with identical column aliases —
the driver sorts columns by name and value-hashes, so aliases and numeric
representations (see functions/exact.py) must match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tts_etl_pipeline_spark.functions.exact import (
    FRAC,
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    disc_price,
    frac,
    money,
)
from tts_etl_pipeline_spark.sources.tables import table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# q1 — pricing summary (flagship): scan -> filter -> hash agg -> sort.
# TPC-H Q1 shape adapted to the driver schema. Filter + projection push into
# the parquet scan; aggregation is a partial+final hash agg (map-side combine)
# so the shuffle carries only 6 groups x 8 aggregates.
# ---------------------------------------------------------------------------
@_register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE)                       AS sum_disc_price,
           CAST(SUM({SQL_CHARGE}) AS DOUBLE)                           AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)       AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(money("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(frac("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
