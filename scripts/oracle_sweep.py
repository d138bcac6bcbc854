#!/usr/bin/env python
"""Full-registry oracle sweep: run every queries() entry at $SPARK_GRAFT_SF_DIR
(default sf0.01) and compare against its oracle_sql() via DuckDB with the
driver-mirroring harness (tests/oracle_harness.py — row count + schema +
exact cell values after order-insensitive canonicalization). Queries without
an oracle (rows-only contract) are executed and reported as rows-only.

Usage: python scripts/oracle_sweep.py [name ...]   (default: all 252)
Exit code 0 only if every oracle-backed query is exact and every rows-only
query returns without error. One summary line per query on stdout.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_harness import compare, duckdb_connection  # noqa: E402
from tts_etl_pipeline_spark.registry import all_oracles, all_queries  # noqa: E402
from tts_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    queries = all_queries()
    oracles = all_oracles()
    names = sys.argv[1:] or sorted(queries)
    spark = get_spark("oracle-sweep")
    con = duckdb_connection(sf_dir)
    n_exact = n_rows_only = n_fail = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            sql = oracles.get(name)
            if sql is None:
                n = df.count()
                n_rows_only += 1
                print(f"ROWS_ONLY {name} rows={n} ({time.perf_counter()-t0:.1f}s)")
                continue
            oracle_pdf = con.execute(sql).fetchdf()
            errs = compare(df, oracle_pdf, name)
            if errs:
                n_fail += 1
                print(f"FAIL {name}: {errs[0]}")
            else:
                n_exact += 1
                print(f"OK {name} ({time.perf_counter()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {e}")
            traceback.print_exc(file=sys.stderr)
    print(f"SWEEP sf_dir={sf_dir} exact={n_exact} rows_only={n_rows_only} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
