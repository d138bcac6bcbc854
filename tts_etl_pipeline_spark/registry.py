"""Central registry: query name -> builder, and name -> DuckDB oracle SQL.

`__spark_entry__.py` (the driver contract) re-exports these. Each operator
module contributes its own QUERIES/ORACLES dicts; names must be unique.
Queries without an oracle entry get the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible ops: LSH, streaming state, ASR).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "tts_etl_pipeline_spark.operators.relational",
    "tts_etl_pipeline_spark.operators.windows",
    "tts_etl_pipeline_spark.operators.grouping",
    "tts_etl_pipeline_spark.operators.events",
    "tts_etl_pipeline_spark.operators.textstats",
    "tts_etl_pipeline_spark.operators.dedup",
    "tts_etl_pipeline_spark.operators.similarity",
    "tts_etl_pipeline_spark.operators.streaming_queries",
    "tts_etl_pipeline_spark.operators.multimodal",
    "tts_etl_pipeline_spark.operators.scalars",
    "tts_etl_pipeline_spark.operators.udfs",
    "tts_etl_pipeline_spark.operators.sketches",
    "tts_etl_pipeline_spark.operators.curation",
]


def _load():
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} from {modname}")
            queries[name] = fn
        oracles.update(mod.ORACLES)
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracles() -> dict[str, str]:
    return _load()[1]
