#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<dir>/<query>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> <query> [query ...]
Writes plans/r14/<query>_<tag>.txt. Evidence artifacts for the optimization
rounds (guide §7.2): the judge checks plan claims against these files."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tts_etl_pipeline_spark.registry import all_queries
from tts_etl_pipeline_spark.session import DEFAULT_SF_DIR, get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = get_spark("plans")
    queries = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
